"""Table profiling: per-column datasheet statistics in one pass.

Every corpus intake starts with "what is actually in this table" —
null rates, cardinalities, value ranges — and at 100 TB the profile
must come from ONE scan, not a loop of per-column queries (the
reference's ad-hoc ``count_num_chars_in_dataset.py`` script is the
single-column special case). The long-format output (one row per
column) is what drift monitors and data-quality gates consume.

Scale notes:

- All statistics for all columns aggregate in a single ``agg`` call —
  one scan, one reduce; no per-column jobs.
- ``exact_distinct=False`` (the default) uses HyperLogLog
  (``approx_count_distinct``, mergeable, bounded memory). The exact
  variant is a COUNT(DISTINCT) per column — fine at oracle scale,
  and what the catalog query uses so DuckDB can reproduce it, but a
  multi-distinct aggregate EXPANDs the input once per distinct column,
  so prefer the sketch at corpus scale.
- min/max are rendered to strings so one schema serves every column
  type; numeric consumers re-cast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "vocab_growth"]


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One-pass per-column profile, long format:
    ``(column, n_rows, n_null, n_distinct, min_value, max_value)``.

    ``n_distinct`` counts non-null values (exact or HLL per
    ``exact_distinct``); ``min_value``/``max_value`` are the column's
    extremes cast to string (NULL for an all-null column).
    """
    names = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in names:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{c}")
        )
        nd = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(nd.cast("bigint").alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    # pivot the single wide row to long format with a stack expression —
    # the reshape runs on a ONE-ROW frame, so its cost is zero
    parts = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in names
    )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(names)}, {parts}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    )


def vocab_growth(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law probe): split the corpus into
    ``n_shards`` deterministic shards (``id_col % n_shards``) and report,
    per shard ordinal, how many NEW token types the shard contributes and
    the cumulative type/occurrence totals as shards accrete in order —
    the standard corpus-diversity datasheet curve (a flattening curve
    means new data is mostly re-treading the existing vocabulary; LLM
    data-mixing decisions read exactly this signal). Tokenization is the
    retrieval tokenizer (lowercased ``[a-z0-9]+`` runs).

    Output: ``(shard_idx, shard_tokens, new_types, cum_types,
    cum_tokens)``, one row per non-empty shard.

    Scale shape: a token's contributing shard is ``min(shard)`` over its
    occurrences — ONE explode + a token-grain groupBy (map-side partial
    min), then an ``n_shards``-row rollup; the cumulative sums run on
    that tiny frame (the house bounded-window idiom — the one
    unpartitioned window touches ``n_shards`` rows, never the corpus).
    Occurrence totals ride the same exploded frame, so the corpus is
    tokenized exactly once.
    """
    from pyspark.sql import Window

    from fireball_data_processing_spark.operators.retrieval import tokens

    occ = docs.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("__shard"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    first_seen = (
        occ.groupBy("__tok")
        .agg(F.min("__shard").alias("shard_idx"))
        .groupBy("shard_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    per_shard = occ.groupBy(F.col("__shard").alias("shard_idx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("shard_tokens")
    )
    w = Window.orderBy("shard_idx").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_shard.join(first_seen, "shard_idx", "left")
        .select(
            "shard_idx",
            "shard_tokens",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
        .withColumn("cum_tokens", F.sum("shard_tokens").over(w).cast("bigint"))
    )
