"""Bradley–Terry preference fitting: known-answer MLE, invariants, and
edge cases (operators/preference.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.preference import (
    bradley_terry_scores,
    bt_ranking,
    comparison_matrix,
)


def _outcomes(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_two_item_mle_is_exact(spark):
    """A beats B 3:1 — the BT MLE is s_A = 3/4, s_B = 1/4 (sum-norm),
    and 16 MM steps land on it exactly at 8 dp."""
    out = _outcomes(spark, [("a", "b")] * 3 + [("b", "a")])
    got = {r["item"]: r for r in bt_ranking(out).collect()}
    assert got["a"]["bt_score"] == 0.75
    assert got["b"]["bt_score"] == 0.25
    assert got["a"]["rank"] == 1 and got["b"]["rank"] == 2
    assert got["a"]["n_wins"] == 3 and got["a"]["n_comparisons"] == 4


def test_scores_sum_to_one_and_rank_follows_dominance(spark):
    """Transitive fixture a > b > c: scores are a sum-normalized
    strength profile and the ranking is the dominance order."""
    rows = (
        [("a", "b")] * 5 + [("b", "a")] * 1
        + [("b", "c")] * 5 + [("c", "b")] * 1
        + [("a", "c")] * 6
    )
    res = sorted(bt_ranking(_outcomes(spark, rows)).collect(),
                 key=lambda r: r["rank"])
    assert [r["item"] for r in res] == ["a", "b", "c"]
    assert abs(sum(r["bt_score"] for r in res) - 1.0) < 1e-6
    assert all(res[i]["bt_score"] >= res[i + 1]["bt_score"]
               for i in range(len(res) - 1))


def test_predicted_probability_matches_observed(spark):
    """The fitted model reproduces the observed head-to-head rate in
    the saturated two-item case: P(a beats b) = s_a / (s_a + s_b)."""
    out = _outcomes(spark, [("a", "b")] * 7 + [("b", "a")] * 3)
    got = {r["item"]: r["bt_score"] for r in bt_ranking(out).collect()}
    p = got["a"] / (got["a"] + got["b"])
    assert abs(p - 0.7) < 1e-6


def test_zero_win_item_ranks_last_with_zero_score(spark):
    out = _outcomes(spark, [("a", "c"), ("b", "c"), ("a", "b"), ("b", "a")])
    got = {r["item"]: r for r in bt_ranking(out).collect()}
    assert got["c"]["bt_score"] == 0.0
    assert got["c"]["rank"] == 3
    assert got["c"]["n_wins"] == 0 and got["c"]["n_comparisons"] == 2


def test_empty_input_yields_empty_frame(spark):
    out = _outcomes(spark, []).filter(F.lit(False))
    res = bradley_terry_scores(comparison_matrix(out))
    assert res.count() == 0
    assert res.columns == ["item", "bt_score", "n_wins", "n_comparisons", "rank"]


def test_matrix_reduces_outcome_stream_once(spark):
    out = _outcomes(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    m = {(r["winner"], r["loser"]): r["n"]
         for r in comparison_matrix(out).collect()}
    assert m == {("a", "b"): 2, ("b", "a"): 1}
