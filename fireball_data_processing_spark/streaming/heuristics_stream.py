"""Streaming heuristics: the same aggregation expressions, incremental.

The reference is batch-only but stream-shaped (Kinesis Firehose provenance,
README.md:45-48). Because the heuristics are declared as Column aggregates
(plans/heuristics.py), the streaming mode reuses them verbatim over
``readStream`` — this is the "declare once, run batch or streaming" payoff
of the Spark-first design (cf. the Structured Streaming paper, SIGMOD '18).

Only the SIMPLE (non-windowed) heuristics stream: ordered per-instance
windows need either event-time watermarking + stateful operators or the
batch path. The FSM extractors (G13/G14) are the stateful analog — see
``fsm_extract`` for the batch form; the streaming form is
``applyInPandasWithState`` over the same per-instance generator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from fireball_data_processing_spark.plans.heuristics import (
    STREAM_SAFE,
    heuristic_exprs,
)
from fireball_data_processing_spark.schema import StreamSchema


def stream_heuristics(
    spark: SparkSession,
    source_dir: str,
    file_schema: StructType | str,
    s: StreamSchema,
    names: tuple[str, ...] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Incremental per-instance heuristics over a file stream.

    Swap ``source_dir``/``fmt`` for a Kinesis/Kafka source in production;
    the aggregation layer is source-agnostic.
    """
    names = names or STREAM_SAFE
    unstreamable = [n for n in names if n not in STREAM_SAFE]
    if unstreamable:
        # mirror the batch registry's loud failure (heuristic_exprs raises
        # for unknown names) instead of silently dropping columns
        raise RuntimeError(
            f"not streamable: {unstreamable} — exact distinct aggregations "
            "cannot run incrementally; use the *_approx variants"
        )
    stream = spark.readStream.schema(file_schema).format(fmt).load(source_dir)
    exprs = heuristic_exprs(s, names)
    return stream.groupBy(F.col(s.instance_col)).agg(*exprs.values())


def fsm_extract(
    df: DataFrame,
    s: StreamSchema,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: StructType | str,
) -> DataFrame:
    """G13/G14 per-instance FSM extraction (reference
    old/distill_rp_commands.py:24-127): inherently sequential per instance,
    parallel across instances — ``groupBy(instance).applyInPandas``.

    ``fn`` receives one instance's events as a pandas frame (NOT guaranteed
    sorted; sort by the seq column first) and returns extracted rows.
    """
    return df.groupBy(s.instance_col).applyInPandas(
        lambda pdf: fn(pdf.sort_values(s.seq_col)), schema=out_schema
    )


def stateful_buffer_flush_stream(
    spark: SparkSession,
    source_dir: str,
    file_schema: StructType | str,
    s: StreamSchema,
    buffer_types: tuple[str, ...],
    flush_types: tuple[str, ...],
    fmt: str = "parquet",
) -> DataFrame:
    """G13's streaming form: the same buffer/flush FSM as ``fsm_extract``,
    incremental via ``applyInPandasWithState`` — the (buffered count, sum)
    carries across micro-batches in GroupState, so a command in batch N
    flushes utterances that arrived in batch N-1.

    Within-batch rows are sorted by seq; cross-batch order is arrival order
    (the Kinesis/Firehose property the reference's layout assumes:
    time-ordered chunk delivery).
    """
    if isinstance(file_schema, StructType):
        inst_type = file_schema[s.instance_col].dataType.simpleString()
    else:  # DDL string: fall back to the synthetic stream's bigint key
        inst_type = "bigint"
    out_schema = (
        f"{s.instance_col} {inst_type}, anchor_id bigint, "
        "n_buffered bigint, buffered_sum double"
    )
    state_schema = "buf_n bigint, buf_sum double"

    def fn(key, pdf_iter, state):
        buf_n, buf_sum = state.get if state.exists else (0, 0.0)
        rows = []
        for pdf in pdf_iter:
            for _, r in pdf.sort_values(s.seq_col).iterrows():
                if r[s.type_col] in buffer_types:
                    buf_n += 1
                    buf_sum += float(r[s.measure_col]) if s.measure_col else 0.0
                elif r[s.type_col] in flush_types:
                    rows.append((key[0], int(r[s.seq_col]), int(buf_n),
                                 round(buf_sum, 6)))
                    buf_n, buf_sum = 0, 0.0
        state.update((int(buf_n), float(buf_sum)))
        yield pd.DataFrame(
            rows,
            columns=[s.instance_col, "anchor_id", "n_buffered", "buffered_sum"],
        ).astype({"anchor_id": "int64", "n_buffered": "int64",
                  "buffered_sum": "float64"})

    stream = spark.readStream.schema(file_schema).format(fmt).load(source_dir)
    return stream.groupBy(F.col(s.instance_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def buffer_flush_fsm(
    buffer_types: tuple[str, ...],
    flush_types: tuple[str, ...],
    s: StreamSchema,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """A concrete FSM in the reference's RP->command shape: buffer
    message-role events; each command-role event flushes the buffer into
    one extracted row (anchor id, buffered count, buffered measure sum)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        buf_n, buf_sum = 0, 0.0
        for _, r in pdf.iterrows():
            if r[s.type_col] in buffer_types:
                buf_n += 1
                buf_sum += float(r[s.measure_col]) if s.measure_col else 0.0
            elif r[s.type_col] in flush_types:
                rows.append(
                    {
                        s.instance_col: r[s.instance_col],
                        "anchor_id": r[s.seq_col],
                        "n_buffered": buf_n,
                        "buffered_sum": round(buf_sum, 6),
                    }
                )
                buf_n, buf_sum = 0, 0.0
        out = pd.DataFrame(
            rows,
            columns=[s.instance_col, "anchor_id", "n_buffered", "buffered_sum"],
        )
        # pin dtypes so empty partitions survive Arrow conversion
        return out.astype(
            {"anchor_id": "int64", "n_buffered": "int64", "buffered_sum": "float64"}
        )

    return fn
