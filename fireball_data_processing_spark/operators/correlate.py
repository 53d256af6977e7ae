"""Message-group correlation (G1) — the reference's core grouping.

Reference ``heuristics/utils.py:92-110``: triggered events (command /
automation_run / combat_state_update / alias / snippet) attach to their
triggering message via ``coalesce(message_id, interaction_id,
probable_interaction_id)``; events whose key matches no message are dropped.

Spark form: derive the correlation key, then a window ``max(is_anchor)``
over ``(instance, correlation_id)`` — ONE scan and one shuffle on the
group key, instead of the semi-join formulation's second scan + distinct
anchor build. A downstream groupBy on the same keys reuses the exchange,
and bucketed-by-instance storage satisfies the window's clustering (the
partition keys are a superset of the bucket key), keeping it shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_correlation_groups(
    df: DataFrame,
    partition_cols: Sequence[str],
    correlation_id: Column,
    anchor_predicate: Column,
    corr_col: str = "correlation_id",
) -> DataFrame:
    """Keep only rows whose ``correlation_id`` matches some anchor row's in
    the same partition; returns the rows with ``corr_col`` attached.

    Anchor rows (e.g. messages) correlate to themselves. Rows with a null
    correlation key OR a null partition key are dropped — exactly the
    semi-join's null semantics (null-unsafe equality matches nothing,
    including another null; ``Window.partitionBy`` would have grouped
    nulls together, so the filter restores the join behavior).
    """
    withc = df.withColumn(corr_col, correlation_id)
    w = Window.partitionBy(*[F.col(c) for c in partition_cols], F.col(corr_col))
    has_anchor = F.max(F.when(anchor_predicate, F.lit(1))).over(w)
    keys_non_null = F.col(corr_col).isNotNull()
    for c in partition_cols:
        keys_non_null = keys_non_null & F.col(c).isNotNull()
    return (
        withc.withColumn("__has_anchor", has_anchor)
        .filter(keys_non_null & (F.col("__has_anchor") == 1))
        .drop("__has_anchor")
    )
