"""Message-group correlation (G1) — the reference's core grouping.

Reference ``heuristics/utils.py:92-110``: triggered events (command /
automation_run / combat_state_update / alias / snippet) attach to their
triggering message via ``coalesce(message_id, interaction_id,
probable_interaction_id)``; events whose key matches no message are dropped.

Spark form: derive the correlation key, then a **left-semi join** against
the anchor rows on ``(instance, correlation_id)``. Both sides partition on
the same key pair, so the join is a co-partitioned shuffled hash join; with
bucketed storage it is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_correlation_groups(
    df: DataFrame,
    partition_cols: Sequence[str],
    correlation_id: Column,
    anchor_predicate: Column,
    corr_col: str = "correlation_id",
) -> DataFrame:
    """Keep only rows whose ``correlation_id`` matches some anchor row's in
    the same partition; returns the rows with ``corr_col`` attached.

    Anchor rows (e.g. messages) correlate to themselves.
    """
    withc = df.withColumn(corr_col, correlation_id)
    anchors = (
        withc.filter(anchor_predicate)
        .select(*[F.col(c) for c in partition_cols], F.col(corr_col))
        .distinct()
    )
    return withc.join(anchors, on=[*partition_cols, corr_col], how="left_semi")
