"""PMI collocations: correctness vs a naive in-memory computation and a
plan pin (one corpus scan, no self-join, no duplicated tokenize subtree)."""

from __future__ import annotations

import contextlib
import io
import itertools
import math
import re
from collections import Counter

from fireball_data_processing_spark.operators.collocations import doc_pmi
from fireball_data_processing_spark.sources.tables import load_table

SMOKE = "/root/testdata/sf0.001"

DOCS = [
    (1, "hash join beats nested loop"),
    (2, "hash join with a shuffle"),
    (3, "hash join again and again"),
    (4, "sort merge join fallback"),
    (5, "the hash table spills"),
]


def _naive_pmi(docs, min_pair_count):
    term_sets = [sorted(set(re.findall(r"[a-z0-9]+", t.lower()))) for _, t in docs]
    n = len(docs)
    df = Counter(t for s in term_sets for t in s)
    pair_n = Counter(p for s in term_sets for p in itertools.combinations(s, 2))
    return {
        (a, b): (
            c,
            df[a],
            df[b],
            round(math.log(c * n / (df[a] * df[b])), 6),
        )
        for (a, b), c in pair_n.items()
        if c >= min_pair_count
    }


def test_doc_pmi_matches_naive(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.ta, r.tb): (r.n_ab, r.df_a, r.df_b, r.pmi)
        for r in doc_pmi(d, min_pair_count=2).collect()
    }
    want = _naive_pmi(DOCS, 2)
    assert got == want
    # sanity: "hash join" co-occurs in 3 of 5 docs, each term in 4
    n_ab, df_a, df_b, pmi = got[("hash", "join")]
    assert (n_ab, df_a, df_b) == (3, 4, 4)
    assert pmi == round(math.log(3 * 5 / (4 * 4)), 6)


def test_doc_pmi_max_terms_cap(spark):
    # a doc with many distinct terms is capped deterministically: only the
    # 3 alphabetically-first terms pair up
    d = spark.createDataFrame(
        [(1, "e d c b a"), (2, "a b c d e")], ["doc_id", "text"]
    )
    rows = doc_pmi(d, min_pair_count=2, max_terms=3).collect()
    seen = {(r.ta, r.tb) for r in rows}
    assert seen == {("a", "b"), ("a", "c"), ("b", "c")}


def test_doc_pmi_plan_single_scan_no_selfjoin(spark):
    d = load_table(spark, SMOKE, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        doc_pmi(d).explain("extended")
    s = buf.getvalue()
    phys = s[s.index("== Physical Plan =="):]
    # one corpus scan for the pair stream + the 1-row count scan; a
    # self-join or df join-back would add more
    assert phys.count("Scan parquet") == 2, phys.count("Scan parquet")
    assert "SortMergeJoin" not in phys
    # pair agg + two df windows; nothing else shuffles row data
    assert len(re.findall(r"Exchange (hash|range)partitioning", phys)) <= 3
