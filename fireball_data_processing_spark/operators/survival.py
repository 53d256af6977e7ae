"""Survival analysis over event streams: the Kaplan-Meier
product-limit estimator of time-to-conversion with right censoring —
"what fraction of users have NOT yet converted by day t?", answered
correctly for users still under observation, which a naive
conversion-rate cut ignores (dropping censored users biases the curve
down; counting them as non-converters biases it up; KM handles both).

Scale design: the data-proportional work is ONE per-subject aggregate
(first exposure, first conversion) — everything after runs at the
DURATION grain (one row per distinct duration bucket, bounded by the
observation window): risk sets are a suffix sum over duration order,
and the product limit is ``exp(cumsum(ln(1 - d/n)))`` — a window over
the bucket-grain frame, never the data. Per-bucket log terms are
rounded to ``round_dp`` so a SQL oracle replays the curve exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["km_curve"]


def km_curve(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier curve from a per-subject frame of
    ``(duration, event)`` — duration in integer buckets (e.g. days),
    ``event`` true for an observed conversion, false for censoring at
    that duration. Returns one row per duration bucket that appears:
    ``(duration, n_risk, n_events, n_censored, survival)`` with
    ``survival`` the product-limit estimate just AFTER that bucket,
    ordered by duration.

    One grouped aggregate to the bucket grain, one suffix-sum window
    for risk sets, one cumulative-log window for the product — both
    windows run over the bucket-grain frame.
    """
    per = (
        durations.select(
            F.col(duration_col).cast("bigint").alias("duration"),
            F.when(F.col(event_col).cast("boolean"), 1)
            .otherwise(0)
            .alias("__e"),
        )
        .groupBy("duration")
        .agg(
            F.sum("__e").cast("bigint").alias("n_events"),
            F.sum(F.lit(1) - F.col("__e")).cast("bigint").alias(
                "n_censored"
            ),
        )
    )
    suffix = Window.orderBy("duration").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risked = per.select(
        "duration",
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(suffix)
        .cast("bigint")
        .alias("n_risk"),
        "n_events",
        "n_censored",
    )
    # d == n (everyone at risk converts) drives survival to exactly 0;
    # ln(0) is NULL in Spark and -inf in DuckDB, so both engines take a
    # -1e9 sentinel instead — exp() underflows it to 0.0 identically.
    d = F.col("n_events").cast("double")
    nr = F.col("n_risk").cast("double")
    log_term = F.round(
        F.when(F.col("n_events") <= 0, F.lit(0.0))
        .when(F.col("n_events") == F.col("n_risk"), F.lit(-1e9))
        .otherwise(F.log(F.lit(1.0) - d / nr)),
        round_dp,
    )
    cum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return risked.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(F.exp(F.sum(log_term).over(cum)), out_dp).alias("survival"),
    ).orderBy("duration")
