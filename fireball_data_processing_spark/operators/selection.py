"""Importance-resampling data selection (DSIR-style) for domain targeting.

Given a small TARGET sample (the domain you want more of) and the RAW
corpus, score every raw document by how target-like its hashed n-gram
distribution is, then keep the top slice: the published
importance-resampling recipe for LM data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"),
re-expressed as Spark aggregations.

Method: word n-grams are hashed into ``n_buckets`` (portable md5
bucketing — cross-engine reproducible, same idiom as
:mod:`.sampling`); the target and raw bucket distributions are two
aggregations; each document's log importance weight is
``sum over its grams of ln(p_target[b] / p_raw[b])`` with add-one
smoothing. High weight = looks like the target domain.

Scale design:

- **Distributions are aggregate-sized** (``n_buckets`` rows), enter the
  scoring plan as ONE broadcast join on the bucket id — never a
  corpus-sized shuffle.
- **Scoring is one pass**: gram-explode the raw corpus once, broadcast-
  join the merged distribution table, one groupBy(doc) sum.
- **The target side is small by construction** (a curated sample);
  building its distribution costs one scan of the sample.
- Two corpus passes total (distribution build + scoring) are inherent:
  scores depend on the completed distributions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.retrieval import tokens

__all__ = ["gram_buckets", "bucket_distribution", "dsir_log_weights"]


def gram_buckets(
    text: Column, n_buckets: int, gram_n: int = 2
) -> Column:
    """Hashed word-``gram_n``-gram bucket ids of a text column
    (array<bigint>, one entry per gram occurrence). Portable md5
    bucketing: ``conv(substr(md5(gram), 1, 8), 16, 10) % n_buckets`` —
    bit-identical in any engine with md5."""
    toks = tokens(text)
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (gram_n - 1), F.lit(0))),
        lambda _, i: F.concat_ws(
            " ", F.slice(toks, i + 1, gram_n)
        ),
    )
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ),
    )


def bucket_distribution(
    docs: DataFrame, n_buckets: int, gram_n: int = 2, text_col: str = "text"
) -> DataFrame:
    """(bucket, n) gram-occurrence counts — ``n_buckets``-row aggregate."""
    return (
        docs.select(
            F.explode(gram_buckets(F.col(text_col), n_buckets, gram_n)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    gram_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, log_weight) for every raw document with at
    least one gram (zero-gram docs have no distribution evidence and no
    output row); log_weight rounded to 6 decimals.

    log_weight = sum over the doc's gram buckets of
    ln( ((t_b + 1) / (T + B)) / ((r_b + 1) / (R + B)) ), add-one
    smoothed so unseen buckets are defined. Positive = more target-like
    than the raw average. Selection = order by log_weight (descending)
    and keep the head, or threshold at 0.

    Size ``n_buckets`` well below the TARGET sample's gram count: the
    smoothing adds B pseudo-counts per side, so B >> T flattens the
    target distribution and drowns its signal. The 4096 default assumes
    corpus-scale gram counts; shrink it for small pilot samples.
    """
    from pyspark.sql.window import Window

    t_dist = bucket_distribution(target, n_buckets, gram_n, text_col)
    r_dist = bucket_distribution(raw, n_buckets, gram_n, text_col)
    # merge the two aggregate-sized tables; the corpus gram totals come
    # from an unpartitioned window over the SAME merged frame — a
    # separate totals agg + join-back would re-plan both distribution
    # subtrees (and re-scan both corpora) once per consumer
    merged = (
        r_dist.withColumnRenamed("n", "r_n")
        .join(t_dist.withColumnRenamed("n", "t_n"), "bucket", "full")
        .select(
            "bucket",
            F.coalesce("r_n", F.lit(0)).alias("r_n"),
            F.coalesce("t_n", F.lit(0)).alias("t_n"),
        )
    )
    w_all = Window.partitionBy()
    r_total = F.sum("r_n").over(w_all)
    t_total = F.sum("t_n").over(w_all)
    log_ratio = F.log(
        (F.col("t_n") + 1) / (t_total + F.lit(n_buckets))
    ) - F.log((F.col("r_n") + 1) / (r_total + F.lit(n_buckets)))
    ratios = merged.select("bucket", log_ratio.alias("log_ratio"))

    per_gram = raw.select(
        F.col(id_col).alias("doc_id"),
        F.explode(gram_buckets(F.col(text_col), n_buckets, gram_n)).alias(
            "bucket"
        ),
    )
    return (
        per_gram.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("log_ratio"), 6).alias("log_weight"),
        )
    )
