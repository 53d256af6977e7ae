"""Driver-side replica of Spark's ``F.round`` on DOUBLE.

Spark's Round expression converts a double via ``BigDecimal.valueOf(x)``
— the SHORTEST decimal representation (``Double.toString``), which
Python's ``repr`` also produces — then ``setScale(dp, HALF_UP)``.
Python's builtin ``round`` is banker's rounding on the exact binary
value and differs at ties (``round(0.5) == 0``), so every driver-side
loop whose trajectory must stay hash-identical to an engine replay
(the bounded-model-state contract of operators/raking.py /
operators/markov.py / operators/pca.py) rounds through this helper
instead. DuckDB's ROUND (half away from zero on the exact double) also
agrees with HALF_UP for the positive-tie cases that arise from rounded
inputs, which is what keeps the unrolled oracles exact."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

__all__ = ["spark_round"]


def spark_round(x: float, dp: int) -> float:
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
        )
    )
