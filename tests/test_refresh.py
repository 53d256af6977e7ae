"""Unit tests for CDC-driven selective recompute (plans/refresh.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.snapshots import fingerprint
from fireball_data_processing_spark.plans.refresh import incremental_refresh


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.withColumn("fp", fingerprint([F.col("text")]))


def _process(docs):
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5("text").alias("h"),
    )


def test_incremental_refresh_equals_full_reprocess(spark):
    old = _docs(
        spark, [(1, "one"), (2, "two"), (3, "three"), (4, "four")]
    )
    new = _docs(
        spark,
        [(1, "one"), (2, "TWO"), (4, "four"), (5, "five")],
        # 3 removed, 2 changed, 5 added, 1/4 unchanged
    )
    got = incremental_refresh(new, old, _process(old), _process).collect()
    want = _process(new).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_incremental_refresh_provenance_and_laziness(spark):
    """Only added/changed keys flow through process; unchanged rows come
    from prior_outputs VERBATIM (proven by poisoning them: carried rows
    keep the poisoned value, which a recompute would have overwritten)."""
    old = _docs(spark, [(1, "a"), (2, "b")])
    new = _docs(spark, [(1, "a"), (2, "B"), (3, "c")])
    poisoned = _process(old).withColumn("n_chars", F.lit(99).cast("bigint"))
    out = {
        r["doc_id"]: (r["n_chars"], r["origin"])
        for r in incremental_refresh(
            new, old, poisoned, _process, origin_col="origin"
        ).collect()
    }
    assert out[1] == (99, "carried")  # reused, NOT recomputed
    assert out[2] == (1, "refreshed")
    assert out[3] == (1, "refreshed")
    assert len(out) == 3  # removed keys are gone


def test_incremental_refresh_empty_diff_carries_everything(spark):
    old = _docs(spark, [(1, "a"), (2, "b")])
    out = incremental_refresh(
        old, old, _process(old), _process, origin_col="origin"
    ).collect()
    assert {r["origin"] for r in out} == {"carried"}
    assert len(out) == 2
