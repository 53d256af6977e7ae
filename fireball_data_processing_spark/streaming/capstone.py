"""End-to-end streaming ingest capstone: one pipeline composing the
pieces the streaming package ships separately — file micro-batch source
→ exact-dup ingest gate (static corpus hash index) → Gopher quality
gate → per-(source, lang) incremental aggregation → exactly-once
epoch-partitioned parquet sink → additive final merge.

This is the shape of a production pretraining-corpus intake job: new
document files land in a directory, each micro-batch is admitted only
if (a) its normalized content hash is NOT already in the frozen corpus
index and (b) it passes the Gopher rules, and the per-batch partial
aggregates are written idempotently (a replayed epoch overwrites its
own ``batch_id`` partition — ``sinks_stream.write_epoch_partition``),
so a crash/restart mid-run cannot double-count. The FINAL table — sum
of the epoch partials — is therefore a pure function of the input set,
independent of micro-batch boundaries and of how many times any epoch
replayed: exactly the property the batch oracle checks (the catalog
query `streaming_ingest_pipeline` replays the whole pipeline as one
DuckDB statement and hash-compares the final table).

100 TB shape: the gate is a SIZE-AWARE anti-join against the hash
index — broadcast-hinted only while the index's Catalyst size estimate
fits the session broadcast threshold (:func:`should_broadcast_index`),
shuffled left-anti above it, because a true-corpus-scale index is
billions of hashes and an unconditional broadcast hint would OOM every
executor (at that scale prefer the band-partitioned near-dup index,
``dedup_stream.corpus_band_index``); the quality rules are per-row
codegen expressions; the shuffle per micro-batch carries only
(source, lang) partial sums; the sink writes one small partition per
epoch. Known-small slice files (one input partition each) get their
parallelism floor via the ``min_parallelism`` constructor flag — the
caller's split-metadata signal hoisted to stream construction, NOT a
per-epoch ``rdd.getNumPartitions()`` probe (which would force a
driver-side plan→RDD conversion every micro-batch). Restart semantics
are pinned by tests/test_capstone_stream.py (kill after the first
epochs, resume from the checkpoint, final table unchanged).

Reference parity: the reference's distill pipeline is a sequence of
batch filter scripts re-reading the corpus per stage
(/root/reference/distill2_authors.py:96-98); this capstone is the
streaming re-expression — one pass per arriving slice, gates composed,
exactly-once output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fireball_data_processing_spark.functions.textstats import gopher_rules
from fireball_data_processing_spark.streaming.dedup_stream import (
    content_hash,
    corpus_hash_index,
    near_new_documents,
)
from fireball_data_processing_spark.streaming.sinks_stream import (
    write_epoch_partition,
)

__all__ = [
    "stage_incoming_slices",
    "should_broadcast_index",
    "ingest_pipeline_batch",
    "run_ingest_pipeline",
    "run_ingest_pipeline_from_stream",
    "read_pipeline_totals",
]

# Unbound-Column cache for the per-epoch plan: Spark Columns are immutable
# expression trees resolved against whatever frame they are applied to, so
# the Gopher rule columns and the content-hash column can be built ONCE per
# (min_words) and reused by every micro-batch. Without this, every epoch
# re-ran the whole py4j expression-construction chatter (~0.3-0.5 s/epoch
# measured driver-side at sf0.1 — pure plan BUILD cost, before any job ran;
# guide §1.1: find where the time actually goes, here the driver).
_GATE_EXPR_CACHE: dict[int, tuple[F.Column, F.Column, F.Column]] = {}


def _gate_exprs(min_words: int) -> tuple[F.Column, F.Column, F.Column]:
    hit = _GATE_EXPR_CACHE.get(min_words)
    if hit is None:
        rules = gopher_rules(F.col("text"), min_words=min_words)
        hit = _GATE_EXPR_CACHE[min_words] = (
            rules["n_words"],
            rules["passes_gopher"],
            content_hash(),
        )
    return hit


def should_broadcast_index(index: DataFrame) -> bool:
    """Size-aware broadcast decision for the static gate index: compare
    Catalyst's optimized-plan size estimate against the session's
    ``spark.sql.autoBroadcastJoinThreshold``. Driver-side metadata only
    — no job runs (``localCheckpoint`` preserves the origin plan's
    stats, so a pinned index still reports its true estimate).

    Why not hint unconditionally: at true corpus scale the exact-dup
    hash index is billions of 32-byte hashes — an unconditional
    ``F.broadcast`` would OOM every executor. Below the threshold the
    hint is kept (the index is known-compact, don't make AQE guess);
    above it — or when broadcasting is disabled with ``-1`` — the gate
    degrades to a plain left-anti join and Catalyst/AQE pick a shuffled
    strategy sized to reality."""
    spark = index.sparkSession
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    if raw.strip().startswith("-"):  # -1 = broadcasting disabled
        return False
    jvm = spark.sparkContext._jvm
    threshold = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    )
    est = int(
        index._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return est <= threshold


def _single_split_batch(batch_df: DataFrame) -> bool:
    """True when the micro-batch's Catalyst size estimate fits ONE scan
    split (``spark.sql.files.maxPartitionBytes``) — i.e. the batch
    already executes as a single task, so collapsing the per-batch
    aggregate to one partition costs no parallelism and removes its
    shuffle exchange outright (guide §2.4). Driver-side metadata probe
    only — no job, no plan→RDD conversion (the ``_pin_if_large`` /
    ``should_broadcast_index`` idiom). A file-source micro-batch always
    carries real byte counts; estimates above ~1 EiB are propagated
    unknowns — treat as LARGE (decline the fast path) rather than
    serializing a corpus-sized batch through one task."""
    if batch_df.isStreaming:  # only meaningful for materialized batches
        return False
    spark = batch_df.sparkSession
    jvm = spark.sparkContext._jvm
    max_pb = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    )
    est = int(
        batch_df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return est <= max_pb  # unknowns (~2^64) always exceed max_pb


def stage_incoming_slices(
    incoming: DataFrame, staging_dir: str, n_slices: int = 4
) -> list[str]:
    """Write the incoming frame as ``n_slices`` single-file parquet
    slice directories (sliced by ``xxhash64(doc_id) % n_slices`` —
    deterministic membership, and uniform under ANY upstream id filter:
    a residue-based slicer would leave slices empty whenever the
    incoming set was itself carved by a correlated modulus, e.g.
    ``doc_id % 4 != 0`` staged at ``n_slices=4``), simulating files
    landing in an ingest directory. Each slice becomes one micro-batch
    under ``maxFilesPerTrigger=1``. Returns the slice directory paths
    in arrival order (only slices that received rows exist on disk).

    ONE pass over ``incoming``: a ``partitionBy("slice")`` write after a
    hash repartition on the slice value — every slice value lands wholly
    in one task, so each ``slice=N`` directory holds exactly one file
    (the ``maxFilesPerTrigger=1`` = one-epoch-per-slice contract). The
    previous form ran one filtered scan + write PER slice — n_slices
    full scans of the incoming frame for the same bytes on disk (guide
    §1.2: fix the distributed algorithm first; §6: one output pass).
    The repartition count is a multiple of ``n_slices`` so distinct
    slice values spread over distinct tasks with high probability (guide
    §2.5 — a hash collision only serializes two slice writes through
    one task, it cannot corrupt slice membership). ``partitionBy``
    strips the synthetic ``slice`` column from the files, so the staged
    schema stays exactly ``incoming.schema``; the stream reader's
    ``recursiveFileLookup`` never does partition inference on the
    ``slice=N`` names."""
    (
        incoming.withColumn(
            "slice",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_slices)).cast("int"),
        )
        .repartition(n_slices * 8, F.col("slice"))
        .write.mode("overwrite")
        .partitionBy("slice")
        .parquet(staging_dir)
    )
    return [
        p
        for s in range(n_slices)
        if os.path.isdir(p := os.path.join(staging_dir, f"slice={s}"))
    ]


def ingest_pipeline_batch(
    batch_df: DataFrame,
    index: DataFrame,
    min_words: int = 50,
    gate: str = "exact",
    broadcast_index: bool | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """The per-micro-batch plan, exposed for batch-twin testing: gate
    the slice against the corpus index, keep Gopher-passing docs, and
    aggregate partial (n_docs, n_tokens) per (source, lang). Pure
    function of (slice rows, static index) — no cross-batch state,
    which is what makes epoch replay harmless.

    ``gate`` picks the dedup semantics (the module docstring's
    true-corpus-scale upgrade path):

    - ``"exact"`` — ``index`` is :func:`~...dedup_stream.corpus_hash_index`
      output; size-aware anti-join on the normalized-content md5:
      broadcast-hinted only while the index's plan-stats estimate fits
      the session broadcast threshold (:func:`should_broadcast_index`),
      plain left-anti (shuffled, AQE-planned) above it — a
      billion-hash corpus index must never be forced onto executors.
      ``broadcast_index`` overrides the auto decision (callers running
      many micro-batches against one pinned index decide ONCE instead
      of per epoch).
    - ``"near"`` — ``index`` is :func:`~...dedup_stream.corpus_band_index`
      output; per-row MinHash signature → LSH band keys → one stateless
      lookup per band (:func:`~...dedup_stream.near_new_documents`), so
      a doc near-duplicating ANY corpus doc under the banding scheme is
      rejected, not just byte-identical repeats.

    ``min_parallelism``: parallelism floor for the near gate. A small
    slice file arrives as ONE input partition (only >maxPartitionBytes
    files get split) and the gate's per-row MinHash expression is the
    cost center — measured 3x on a single-partition sf0.1 slice when
    repartitioned to the core count. The floor is the caller's
    split-metadata signal hoisted to stream construction (the caller
    knows its slice sizes; ``run_ingest_pipeline`` forwards it), so no
    per-epoch ``batch_df.rdd.getNumPartitions()`` probe — a driver-side
    plan→RDD conversion every micro-batch — is needed. Leave ``None``
    at corpus scale: the reader's byte-based splits already provide the
    parallelism.
    """
    n_words_col, passes_col, hash_col = _gate_exprs(min_words)
    # Single-split fast path (exact gate only): a staged slice file below
    # maxPartitionBytes arrives as ONE scan partition, so the per-batch
    # (source, lang) aggregate's shuffle exchange moves zero-parallelism
    # data — coalesce(1) before the groupBy satisfies the aggregate's
    # clustering requirement with SinglePartition and the planner drops
    # the Exchange (and with it one AQE query-stage job PER EPOCH; plan
    # fact in plans/r13/streaming_ingest_pipeline_after.txt). Gated on
    # the batch's size estimate: a corpus-scale batch keeps the
    # distributed aggregate (its partial-agg shuffle is taxonomy-sized
    # and its map side needs every scan split). The near gate never
    # takes this path — its min_parallelism repartition exists to fan
    # the per-row MinHash out, and a pre-aggregate coalesce(1) would
    # fuse upstream and serialize exactly that work.
    single_task = gate == "exact" and _single_split_batch(batch_df)
    if gate == "exact":
        keyed = batch_df.withColumn("content_hash", hash_col)
        if broadcast_index is None:
            broadcast_index = should_broadcast_index(index)
        right = F.broadcast(index) if broadcast_index else index
        fresh = keyed.join(right, "content_hash", "left_anti")
    elif gate == "near":
        if min_parallelism is not None and min_parallelism > 1:
            batch_df = batch_df.repartition(min_parallelism)
        fresh = near_new_documents(batch_df, index)
    else:
        raise ValueError(f"unknown gate {gate!r}; expected 'exact' or 'near'")
    gated = fresh.withColumn("n_words", n_words_col).filter(passes_col)
    if single_task:
        gated = gated.coalesce(1)
    return gated.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_tokens"),
    )


def run_ingest_pipeline(
    spark: SparkSession,
    staging_dir: str,
    file_schema,
    index: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    min_words: int = 50,
    gate: str = "exact",
    min_parallelism: int | None = None,
) -> None:
    """Run the capstone stream to completion over everything currently
    staged (``availableNow`` + ``maxFilesPerTrigger=1`` — one epoch per
    staged slice file). Restart-safe: offsets commit only after the
    epoch's partial is written, and the write overwrites its own
    ``batch_id`` partition, so resuming from ``checkpoint_dir`` after a
    kill replays at most the in-flight epoch and replaces — never
    duplicates — its output. ``gate``/``index``/``min_parallelism`` as
    in :func:`ingest_pipeline_batch` (exact hash index or LSH band
    index; parallelism floor for known-small slices)."""
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging_dir)
    )
    run_ingest_pipeline_from_stream(
        stream, index, out_path, checkpoint_dir,
        min_words=min_words, gate=gate, min_parallelism=min_parallelism,
    )


def run_ingest_pipeline_from_stream(
    stream: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    min_words: int = 50,
    gate: str = "exact",
    min_parallelism: int | None = None,
) -> None:
    """Run the capstone over ANY already-opened streaming DataFrame —
    the connector seam (``sources_stream.open_event_stream``): the file
    micro-batch source :func:`run_ingest_pipeline` builds is just one
    producer; a Kafka topic or a vendor Kinesis connector plugs in by
    swapping the ``open_event_stream`` line that built ``stream``
    (``fmt="kafka", payload="value"`` / ``fmt="aws-kinesis",
    payload="data"`` with the stream name/region riding ``options``) —
    nothing in the pipeline below changes, pinned by
    tests/test_stream_sources.py (identical final-table rows through
    the seam vs the direct file stream). The exact gate's broadcast
    decision is taken ONCE here, outside the epoch loop — the index is
    static for the stream's lifetime, so per-epoch re-checks would be
    pure driver overhead. Exactly-once/restart semantics as in
    :func:`run_ingest_pipeline`."""
    bcast = should_broadcast_index(index) if gate == "exact" else None

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        partial = ingest_pipeline_batch(
            batch_df, index, min_words, gate=gate,
            broadcast_index=bcast, min_parallelism=min_parallelism,
        )
        write_epoch_partition(partial, epoch_id, out_path)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_pipeline_totals(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the epoch partials into the final table. Partial sums are
    additive, so the result is independent of micro-batch boundaries —
    the invariant the batch oracle and the restart test both pin."""
    parts = spark.read.parquet(out_path)
    return parts.groupBy("source", "lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
