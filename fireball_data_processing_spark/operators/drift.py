"""Distribution-drift monitoring between corpus snapshots.

When a corpus is re-ingested or extended (see :mod:`.snapshots` for the
row-level diff), the pipeline needs a DISTRIBUTION-level answer too:
did the composition shift — language mix, source mix, length profile,
quality bands? The standard scorecards are population stability index
(PSI, the banking-world drift metric: ``sum((p-q) * ln(p/q))``) and
KL divergence, computed per category bucket.

Scale design: each side is reduced to an aggregate-sized (bucket,
count) table in one pass; the merge is a full outer join of two
aggregates; shares and totals ride windows over the merged frame (no
join-back re-planning of the aggregation subtrees). Add-one smoothing
keeps empty buckets defined, so appearing/disappearing categories
contribute large-but-finite drift instead of infinities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["bucket_shares", "distribution_drift"]


def bucket_shares(df: DataFrame, bucket: Column) -> DataFrame:
    """(bucket, n) counts of ``bucket`` over ``df`` — one aggregation."""
    return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def distribution_drift(
    before: DataFrame,
    after: DataFrame,
    bucket: Column,
) -> DataFrame:
    """Per-bucket drift contributions between two snapshots, plus the
    smoothed shares they derive from.

    Returns (bucket, n_before, n_after, p_before, p_after, psi_term,
    kl_term) with shares add-one smoothed over the union bucket set and
    rounded to 6 decimals; total PSI/KL = sum of the term columns.
    PSI reading (industry rule of thumb): < 0.1 stable, 0.1-0.25 watch,
    > 0.25 shifted.
    """
    b = bucket_shares(before, bucket).withColumnRenamed("n", "n_before")
    a = bucket_shares(after, bucket).withColumnRenamed("n", "n_after")
    # null-safe join key: a NULL bucket (missing source/lang) is a real
    # category — an equi-join would never match the two NULL rows and
    # split them into two half-counted buckets, inflating the bucket
    # count and skewing every share
    merged = b.join(
        a, b["bucket"].eqNullSafe(a["bucket"]), "full"
    ).select(
        F.coalesce(b["bucket"], a["bucket"]).alias("bucket"),
        F.coalesce("n_before", F.lit(0)).alias("n_before"),
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
    )
    w_all = Window.partitionBy()
    n_buckets = F.count(F.lit(1)).over(w_all)
    p = (F.col("n_before") + 1) / (F.sum("n_before").over(w_all) + n_buckets)
    q = (F.col("n_after") + 1) / (F.sum("n_after").over(w_all) + n_buckets)
    return merged.select(
        "bucket",
        "n_before",
        "n_after",
        F.round(p, 6).alias("p_before"),
        F.round(q, 6).alias("p_after"),
        F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        F.round(p * F.log(p / q), 6).alias("kl_term"),
    )
