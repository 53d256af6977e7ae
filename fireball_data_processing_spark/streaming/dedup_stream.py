"""Streaming deduplication — the ingest-side gate of a training-data
pipeline.

The batch dedup family (``operators/dedup.py``) answers "which existing
docs duplicate each other"; this module answers the firehose question:
"is this NEW document already in the corpus, or a repeat within the
stream?" — the shape a Kinesis/Kafka-fed ingestion job needs.

Plan, all stateless or watermark-bounded:

1. per-row content hash (md5 over normalized text — same normalization as
   ``exact_dedup_groups``, so the stream agrees with the batch index);
2. stream-static LEFT ANTI join against the corpus hash index (stateless:
   the static side is re-scannable per micro-batch, and broadcastable when
   the index is compact);
3. in-stream first-occurrence dedup: ``dropDuplicatesWithinWatermark``
   bounds the hash-state by event time (without a watermark column the
   state would grow with distinct hashes forever — refuse rather than ship
   an unbounded-state default).

At 100 TB the index side is the materialized hash column of the corpus
(one 32-byte md5 per doc — ~3 TB/100B docs, parquet-scannable), refreshed
by the batch job; near-dup streaming would compose the same way via a
MinHash signature stage (``build_minhash_index``) with band-key lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from fireball_data_processing_spark.functions.text import normalize_text


def content_hash(text_col: str = "text") -> F.Column:
    """The stream/batch-agreed exact-dedup key (normalized-text md5)."""
    return F.md5(normalize_text(F.col(text_col)))


def corpus_hash_index(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct content hashes of the existing corpus — the static side of
    the stream-static anti join. Materialize to parquet for a long-running
    stream so micro-batches rescan the compact index, not the corpus."""
    return corpus.select(content_hash(text_col).alias("content_hash")).distinct()


def stream_new_documents(
    spark: SparkSession,
    source_dir: str,
    file_schema: StructType | str,
    index: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
    fmt: str = "parquet",
    allow_unbounded_state: bool = False,
) -> DataFrame:
    """Documents from the stream that are new to the corpus AND the first
    of their content within the stream.

    ``ts_col``: event-time column for the within-stream dedup watermark.
    ``None`` would use plain ``dropDuplicates`` on the hash — correct but
    unbounded state, only acceptable for bounded replays (tests,
    backfills) — so it is refused unless the caller passes
    ``allow_unbounded_state=True`` explicitly.
    """
    if ts_col is None and not allow_unbounded_state:
        raise ValueError(
            "ts_col=None keeps every seen content hash in the state store "
            "forever; pass allow_unbounded_state=True only for bounded "
            "replays, or provide an event-time column for the watermark"
        )
    stream = spark.readStream.schema(file_schema).format(fmt).load(source_dir)
    hashed = stream.withColumn("content_hash", content_hash(text_col))
    fresh = hashed.join(index, "content_hash", "left_anti")
    if ts_col is not None:
        fresh = fresh.withWatermark(ts_col, watermark)
        return fresh.dropDuplicatesWithinWatermark(["content_hash"])
    return fresh.dropDuplicates(["content_hash"])
