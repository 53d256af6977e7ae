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

__all__ = ["bucket_shares", "cusum_alarm", "distribution_drift", "jsd_matrix"]


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


def jsd_matrix(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the per-domain
    unigram distributions of ``token_col`` — the k-way corpus-composition
    scorecard ("which domains are token-level redundant, which add
    genuinely new text?") that PSI/KL drift (two snapshots, category
    buckets) doesn't give: JSD is symmetric, bounded in [0, 1] bits, and
    defined WITHOUT smoothing even on disjoint vocabularies.

    Union-free decomposition: with m = (p+q)/2, tokens private to one
    side contribute exactly ``0.5 * p_i`` bits, so

        JSD(P,Q) = 0.5*(|P| - sum_shared p) + 0.5*(|Q| - sum_shared q)
                 + sum_shared [0.5*p*log2(2p/(p+q)) + 0.5*q*log2(2q/(p+q))]

    needs only an INNER self-join on token — never a full-outer union
    frame per pair. |P| is the sum of the rounded probabilities (not a
    literal 1.0), so the only-mass term is engine-exact.

    Plan shape: one explode + one (domain, token) aggregate over the
    data; the self-join and everything after run on the per-domain
    vocabulary table (aggregate-sized). The k^2 pair frame is built from
    the broadcast domain list, so pairs with zero shared tokens still
    appear (JSD = 1 bit exactly). Returns
    ``(domain_a, domain_b, n_shared_tokens, jsd_bits)`` for a < b,
    ordered.
    """
    counts = (
        df.select(F.col(domain_col).alias("d"), F.col(token_col).alias("t"))
        .groupBy("d", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("d").agg(F.sum("n").alias("tot"))
    probs = counts.join(F.broadcast(totals), "d").select(
        "d",
        "t",
        F.round(F.col("n").cast("double") / F.col("tot"), round_dp).alias(
            "p"
        ),
    )
    mass = probs.groupBy("d").agg(F.round(F.sum("p"), round_dp).alias("mass"))
    a = probs.select(
        F.col("d").alias("domain_a"), "t", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("d").alias("domain_b"), "t", F.col("p").alias("pb")
    )
    half = F.lit(0.5)
    shared = (
        a.join(b, "t")
        .filter(F.col("domain_a") < F.col("domain_b"))
        .groupBy("domain_a", "domain_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_tokens"),
            F.round(F.sum("pa"), round_dp).alias("sp"),
            F.round(F.sum("pb"), round_dp).alias("sq"),
            F.round(
                F.sum(
                    half
                    * F.col("pa")
                    * F.log2(
                        F.lit(2.0) * F.col("pa")
                        / (F.col("pa") + F.col("pb"))
                    )
                    + half
                    * F.col("pb")
                    * F.log2(
                        F.lit(2.0) * F.col("pb")
                        / (F.col("pa") + F.col("pb"))
                    )
                ),
                round_dp,
            ).alias("shared_term"),
        )
    )
    doms = mass.select(F.col("d").alias("domain_a"), F.col("mass").alias("ma"))
    domsb = mass.select(
        F.col("d").alias("domain_b"), F.col("mass").alias("mb")
    )
    pairs = (
        F.broadcast(doms)
        .crossJoin(F.broadcast(domsb))
        .filter(F.col("domain_a") < F.col("domain_b"))
    )
    return (
        pairs.join(shared, ["domain_a", "domain_b"], "left")
        .select(
            "domain_a",
            "domain_b",
            F.coalesce(F.col("n_shared_tokens"), F.lit(0).cast("bigint")).alias(
                "n_shared_tokens"
            ),
            F.round(
                half * (F.col("ma") - F.coalesce(F.col("sp"), F.lit(0.0)))
                + half * (F.col("mb") - F.coalesce(F.col("sq"), F.lit(0.0)))
                + F.coalesce(F.col("shared_term"), F.lit(0.0)),
                out_dp,
            ).alias("jsd_bits"),
        )
        .orderBy("domain_a", "domain_b")
    )


def cusum_alarm(
    series: DataFrame,
    time_col: str,
    value_col: str,
    target: float,
    allowance: float,
    threshold: float,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """One-sided (upward) CUSUM control chart over an ordered series —
    the change-point monitor that accumulates SMALL persistent shifts a
    per-point outlier rule (mad_outlier_stats) never trips:
    ``S_t = max(0, S_{t-1} + (x_t - target - allowance))``, alarm when
    ``S_t > threshold``.

    The clamped recursion is NOT a plain cumulative sum, but it has a
    closed window form: with ``C_t = cumsum(x - target - allowance)``,

        S_t = C_t - min(0, running_min(C_t))

    so the whole chart is TWO windows over the (already aggregated,
    time-grain) series — no recursion, no UDF, no state. Returns
    ``(time, x, cusum, alarm)`` ordered by time; per-step terms are
    rounded to ``round_dp`` so a SQL oracle replays the walk exactly.
    """
    from pyspark.sql.window import Window

    drift_rate = F.lit(float(target) + float(allowance))
    w = Window.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = F.round(
        F.sum(
            F.round(F.col(value_col).cast("double") - drift_rate, round_dp)
        ).over(w),
        round_dp,
    )
    staged = series.select(
        F.col(time_col).alias("time"),
        F.round(F.col(value_col).cast("double"), out_dp).alias("x"),
        c.alias("__c"),
    )
    w2 = Window.orderBy("time").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = F.round(
        F.col("__c")
        - F.least(F.lit(0.0), F.min("__c").over(w2)),
        round_dp,
    )
    return staged.select(
        "time",
        "x",
        F.round(s, out_dp).alias("cusum"),
        (s > F.lit(float(threshold))).alias("alarm"),
    ).orderBy("time")
