"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a handful of hot instances (the reference's "250MB+ instances")
dominate a single reducer. For algebraic aggregates the fix is salting:
phase 1 aggregates on (key, salt) spreading a hot key over N reducers,
phase 2 merges the partials on the key alone. AQE's skew-join splitting
covers joins; this covers aggregations.

Only algebraic aggregates decompose this way (sum/count/min/max and
compositions like avg = sum/count). Holistic aggregates (exact distinct,
exact percentile) need different machinery (partial sketches / repartition
by value) — callers get a clear error instead of silently wrong results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column -> (fn, input
    column) with fn in {sum, count, min, max}. ``avg`` is expressible as
    sum/count by the caller.

    The salt is derived from a hash of the full row id-ish columns via
    ``spark_partition_id``-free, deterministic ``pmod(hash(*keys, rand-free
    monotonically_increasing_id))`` — but since partial aggregation is
    per-partition anyway, a random-free round-robin on the input partition
    id suffices and keeps the operator deterministic.
    """
    bad = [c for c, (fn, _) in aggs.items() if fn not in _MERGEABLE]
    if bad:
        raise ValueError(f"non-algebraic aggregates cannot be salted: {bad}")

    salt = F.pmod(F.spark_partition_id(), F.lit(num_salts)).alias("__salt")
    phase1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(f"__p_{out}"))
        else:
            phase1_exprs.append(getattr(F, fn)(col).alias(f"__p_{out}"))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *phase1_exprs
    )

    phase2_exprs = []
    for out, (fn, _) in aggs.items():
        merge = "sum" if fn in ("sum", "count") else fn
        phase2_exprs.append(getattr(F, merge)(f"__p_{out}").alias(out))
    return phase1.groupBy(*keys).agg(*phase2_exprs)
