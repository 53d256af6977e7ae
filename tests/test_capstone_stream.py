"""Streaming ingest capstone: end-to-end pipeline semantics, batch
parity, micro-batch-boundary independence, and restart/replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireball_data_processing_spark.sources.tables import load_table
from fireball_data_processing_spark.streaming.capstone import (
    ingest_pipeline_batch,
    read_pipeline_totals,
    run_ingest_pipeline,
    stage_incoming_slices,
)
from fireball_data_processing_spark.streaming.dedup_stream import (
    corpus_hash_index,
)

SMOKE = "/root/testdata/sf0.001"
MIN_WORDS = 10  # sf0.001 docs are short; the CATALOG query gates at the
# Gopher default (50) and its oracle hard-codes n_words >= 50 — these
# tests pin stream/batch/restart INVARIANTS, not the production cut


def _fixture(spark):
    d = load_table(spark, SMOKE, "documents")
    corpus = d.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    incoming = d.filter(F.pmod(F.col("doc_id"), F.lit(4)) != 0)
    return corpus, incoming


def _batch_truth(corpus, incoming):
    """The whole pipeline as ONE batch plan — the invariant the stream
    must reproduce regardless of micro-batch boundaries or replays."""
    return ingest_pipeline_batch(
        incoming, corpus_hash_index(corpus), min_words=MIN_WORDS
    )


def _rows(df):
    return sorted(
        (r["source"], r["lang"], r["n_docs"], r["n_tokens"])
        for r in df.collect()
    )


def test_stream_matches_batch_plan(spark, tmp_path):
    corpus, incoming = _fixture(spark)
    staging = str(tmp_path / "staging")
    stage_incoming_slices(incoming, staging, n_slices=4)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_ingest_pipeline(
        spark, staging, incoming.schema, corpus_hash_index(corpus),
        out, ckpt, min_words=MIN_WORDS,
    )
    got = read_pipeline_totals(spark, out)
    want = _batch_truth(corpus, incoming)
    assert _rows(got) == _rows(want)
    assert got.count() > 0
    # one epoch partial per staged slice file
    parts = spark.read.parquet(out)
    assert parts.select("batch_id").distinct().count() >= 2


def test_final_table_independent_of_slicing(spark, tmp_path):
    """2 slices vs 5 slices: different micro-batch boundaries, same
    final table (the additive-partials invariant)."""
    corpus, incoming = _fixture(spark)
    idx = corpus_hash_index(corpus)
    results = []
    for n_slices in (2, 5):
        base = tmp_path / f"s{n_slices}"
        staging = str(base / "staging")
        stage_incoming_slices(incoming, staging, n_slices=n_slices)
        out, ckpt = str(base / "out"), str(base / "ckpt")
        run_ingest_pipeline(
            spark, staging, incoming.schema, idx, out, ckpt,
            min_words=MIN_WORDS,
        )
        results.append(_rows(read_pipeline_totals(spark, out)))
    assert results[0] == results[1]


def test_restart_resumes_without_double_counting(spark, tmp_path):
    """Run the stream over the first slices, then stage more and resume
    from the SAME checkpoint: already-processed epochs are not re-run
    (their partials survive untouched) and the final table equals the
    all-at-once batch truth. Then a full no-new-data restart changes
    nothing — the exactly-once contract."""
    corpus, incoming = _fixture(spark)
    idx = corpus_hash_index(corpus)
    staging = str(tmp_path / "staging")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    first = incoming.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    later = incoming.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    stage_incoming_slices(first, str(tmp_path / "staging"), n_slices=2)
    run_ingest_pipeline(
        spark, staging, incoming.schema, idx, out, ckpt, min_words=MIN_WORDS
    )
    mid = _rows(read_pipeline_totals(spark, out))
    assert mid == _rows(_batch_truth(corpus, first))

    # more files land (fresh slice subdirs), resume from the checkpoint
    for s, p in enumerate(
        stage_incoming_slices(later, str(tmp_path / "staging2"), n_slices=2)
    ):
        import shutil

        shutil.copytree(p, f"{staging}/late{s}")
    run_ingest_pipeline(
        spark, staging, incoming.schema, idx, out, ckpt, min_words=MIN_WORDS
    )
    assert _rows(read_pipeline_totals(spark, out)) == _rows(
        _batch_truth(corpus, incoming)
    )

    # restart with nothing new: no duplicates, table unchanged
    run_ingest_pipeline(
        spark, staging, incoming.schema, idx, out, ckpt, min_words=MIN_WORDS
    )
    assert _rows(read_pipeline_totals(spark, out)) == _rows(
        _batch_truth(corpus, incoming)
    )


def test_gate_rejects_corpus_duplicates_and_low_quality(spark):
    """Unit-level semantics of the composed per-batch plan: a doc whose
    normalized content is already in the corpus index never reaches the
    aggregate, and neither does a Gopher-failing doc."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "a", "en")],
        "doc_id bigint, text string, source string, lang string",
    )
    good = "the old ship sailed for a distant port and it was full of tea " * 3
    incoming = spark.createDataFrame(
        [
            # duplicate of the corpus doc (same normalized content)
            (2, "The  quick brown fox jumps over the lazy dog today", "a", "en"),
            # passes gopher at MIN_WORDS=10 (stop words, alpha, length)
            (3, good, "b", "en"),
            # too short -> fails the word-count rule
            (4, "tiny", "b", "en"),
        ],
        "doc_id bigint, text string, source string, lang string",
    )
    got = _rows(
        ingest_pipeline_batch(
            incoming, corpus_hash_index(corpus), min_words=10
        )
    )
    assert got == [("b", "en", 1, len(good.split()))]
