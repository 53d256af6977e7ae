"""Structured Streaming parity: the same heuristic expressions produce the
same results incrementally (file stream, availableNow trigger) as in batch."""

from __future__ import annotations

import os
import shutil
import tempfile

from fireball_data_processing_spark.plans.heuristics import (
    STREAM_SAFE,
    heuristics_matrix,
)
from fireball_data_processing_spark.schema import SYNTHETIC_STREAM
from fireball_data_processing_spark.sources.tables import load_table
from fireball_data_processing_spark.streaming.heuristics_stream import (
    stream_heuristics,
)

SMOKE = "/root/testdata/sf0.001"


def test_stream_heuristics_matches_batch(spark):
    src = tempfile.mkdtemp(prefix="fb_stream_")
    try:
        shutil.copy(os.path.join(SMOKE, "events.parquet"), src)
        batch_df = load_table(spark, SMOKE, "events")
        file_schema = batch_df.schema

        stream = stream_heuristics(
            spark, src, file_schema, SYNTHETIC_STREAM, names=STREAM_SAFE
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("heur_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            r["user_id"]: r.asDict()
            for r in spark.sql("SELECT * FROM heur_stream").collect()
        }
        want = {
            r["user_id"]: r.asDict()
            for r in heuristics_matrix(
                batch_df, SYNTHETIC_STREAM, STREAM_SAFE
            ).collect()
        }
        assert got.keys() == want.keys()
        for uid, row in want.items():
            for col, val in row.items():
                g = got[uid][col]
                if isinstance(val, float):
                    assert abs(g - val) < 1e-9, (uid, col, g, val)
                else:
                    assert g == val, (uid, col, g, val)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stateful_fsm_stream_matches_batch(spark):
    import os
    import shutil
    import tempfile

    from fireball_data_processing_spark.streaming.heuristics_stream import (
        buffer_flush_fsm,
        fsm_extract,
        stateful_buffer_flush_stream,
    )

    src = tempfile.mkdtemp(prefix="fb_fsm_stream_")
    try:
        shutil.copy(os.path.join(SMOKE, "events.parquet"), src)
        batch_df = load_table(spark, SMOKE, "events")

        stream = stateful_buffer_flush_stream(
            spark, src, batch_df.schema, SYNTHETIC_STREAM,
            buffer_types=("view",), flush_types=("purchase",),
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("fsm_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["anchor_id"]): (r["n_buffered"], r["buffered_sum"])
            for r in spark.sql("SELECT * FROM fsm_stream").collect()
        }
        want_df = fsm_extract(
            batch_df, SYNTHETIC_STREAM,
            buffer_flush_fsm(("view",), ("purchase",), SYNTHETIC_STREAM),
            "user_id bigint, anchor_id bigint, n_buffered bigint, buffered_sum double",
        )
        want = {
            (r["user_id"], r["anchor_id"]): (r["n_buffered"], r["buffered_sum"])
            for r in want_df.collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
