"""Streaming sinks: exactly-once parquet output and multi-way routing.

Structured Streaming's file sink is append-only and relies on its own
transaction log; production pipelines routinely need (a) exactly-once
parquet output that survives micro-batch REPLAY (a failed batch is
re-run with the same epoch id after restart), and (b) one input pass
fanned out to several destinations (keep/reject routing by a quality
predicate). Both are `foreachBatch` patterns:

- **Idempotent sink**: every micro-batch is written to a
  ``batch_id=<epoch>`` partition (a plain overwrite of exactly that
  epoch's directory — the partition value is inferred from the
  directory name on read) — a replayed epoch REPLACES its own
  partition instead of appending a duplicate, which upgrades the file
  sink's at-least-once replay to exactly-once output without any
  table-format dependency. Readers just scan the directory; the epoch
  partition column also gives free per-batch lineage/debugging.
- **Routing sink**: the micro-batch frame is persisted once, each
  route filters and writes from the cached frame (one source pass per
  batch, not one per destination), and every route is epoch-partition
  idempotent the same way.

Checkpointing: pass ``checkpoint_dir`` — offsets commit only after
``foreachBatch`` returns, so a crash mid-write replays the epoch and
the overwrite makes the replay harmless.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "write_epoch_partition",
    "idempotent_parquet_sink",
    "routed_parquet_sink",
]


def write_epoch_partition(batch_df: DataFrame, epoch_id: int, path: str) -> None:
    """Write one micro-batch to ``batch_id=<epoch_id>``: re-running the
    same epoch replaces its own partition (idempotent replay), touching
    no other epoch's output.

    Implemented as a write into a hidden staging directory (dot-prefixed,
    so directory scans of ``path`` never see it) followed by one
    delete+rename swap onto the epoch's own directory — the partition
    value is inferred from the directory name on read, the same on-disk
    layout the earlier ``partitionBy("batch_id")`` +
    dynamic-partition-overwrite form produced, minus that form's
    partitioned-write + per-partition commit machinery (guide §1.2/§6:
    this sink runs once per micro-batch, so its fixed cost multiplies by
    the epoch count; the swap is two filesystem metadata calls). The
    swap — not a plain ``mode("overwrite")`` of the target dir — is
    load-bearing: overwrite deletes the target BEFORE the job runs, so a
    replayed batch whose frame derives from the sink's own output (the
    replay-idempotency contract pinned by tests/test_cusum_stream.py)
    would read files out from under itself. Writing to staging keeps the
    old files readable for the whole job, like the dynamic form's
    commit-time swap. Strictly stronger idempotency than dynamic
    overwrite: an epoch replayed EMPTY also clears its stale partition
    (dynamic overwrite only replaces partitions present in the written
    data)."""
    target = os.path.join(path, f"batch_id={int(epoch_id)}")
    staging = os.path.join(path, f".batch_id={int(epoch_id)}.staging")
    batch_df.write.mode("overwrite").parquet(staging)
    jvm = batch_df.sparkSession._jvm
    hconf = batch_df.sparkSession._jsc.hadoopConfiguration()
    jtarget = jvm.org.apache.hadoop.fs.Path(target)
    fs = jtarget.getFileSystem(hconf)
    fs.delete(jtarget, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), jtarget)


def idempotent_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once parquet sink via epoch-partitioned overwrite."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: write_epoch_partition(df, epoch, path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def routed_parquet_sink(
    stream: DataFrame,
    routes: Mapping[str, Column],
    paths: Mapping[str, str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Fan one stream out to several parquet destinations in a single
    input pass per micro-batch.

    ``routes`` maps route name -> boolean Column (evaluated against the
    micro-batch); ``paths`` maps the same names -> output directories.
    The batch frame is persisted once and each route filters from the
    cache, so the upstream plan (source read + transforms) executes once
    per batch regardless of route count. Rows matching several routes go
    to each (filtering is independent); each destination is
    epoch-partition idempotent.
    """
    missing = set(routes) - set(paths)
    if missing:
        raise ValueError(f"routes without a path: {sorted(missing)}")

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for name, cond in routes.items():
                write_epoch_partition(
                    batch_df.filter(cond), epoch_id, paths[name]
                )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
