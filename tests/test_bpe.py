"""BPE: train-on-frequencies determinism, application goldens, and the
distributed word-count -> train -> apply round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireball_data_processing_spark.functions.bpe import (
    END,
    apply_merges,
    bpe_tokens_udf,
    train_bpe,
    word_frequencies,
)


def test_train_bpe_classic_example():
    # the canonical Sennrich et al. toy corpus
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, 4)
    # 'es' dominates (newest+widest = 9); 't' is word-final there, so the
    # next merge takes the marked symbol directly; then 'lo' (low+lower=7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + END)
    assert merges[2] == ("l", "o")
    # training is deterministic: same input, same merges
    assert merges == train_bpe(list(freqs), 4)


def test_apply_merges_golden():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, 8)
    # seen word collapses far; unseen word falls back toward chars
    assert len(apply_merges("newest", merges)) < len("newest")
    unseen = apply_merges("zzq", merges)
    assert unseen == ["z", "z", "q" + END]
    assert apply_merges("", merges) == []


def test_word_frequencies_and_udf_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower newest"), (2, "newest newest widest low")],
        ["doc_id", "text"],
    )
    wf = {r.word: r.n for r in word_frequencies(docs, min_count=1).collect()}
    assert wf == {"low": 3, "lower": 1, "newest": 3, "widest": 1}

    merges = train_bpe(sorted(wf.items()), 6)
    out = docs.select(
        "doc_id", bpe_tokens_udf(merges)(F.col("text")).alias("toks")
    ).collect()
    got = {r.doc_id: r.toks for r in out}
    # the UDF path equals the plain-Python path word by word
    for doc_id, text in [(1, "low low lower newest"), (2, "newest newest widest low")]:
        want = [t for w in text.split() for t in apply_merges(w, merges)]
        assert got[doc_id] == want
    # every token stream reassembles to the original text
    for doc_id, text in [(1, "low low lower newest")]:
        joined = "".join(got[doc_id]).replace(END, " ").strip()
        assert joined == text.replace(" ", " ")


def test_word_frequencies_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc dd dd dd dd")], ["doc_id", "text"]
    )
    # min_count floors hapax noise before anything can reach a collect
    floored = {r.word: r.n for r in word_frequencies(docs, min_count=2).collect()}
    assert floored == {"aa": 3, "bb": 2, "dd": 4}
    # top_n caps the table regardless of corpus shape, count-desc with
    # deterministic word tie-break
    top = [
        (r.word, r.n)
        for r in word_frequencies(docs, min_count=1, top_n=2).collect()
    ]
    assert sorted(top) == [("aa", 3), ("dd", 4)]
