"""SPRT sequential test (operators/seqtest.py), annotator disagreement
(plans/agreement.py item_disagreement), exponential decay weight
(operators/selection.py): hand-computed decisions and invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.selection import exp_decay_weight
from fireball_data_processing_spark.operators.seqtest import sprt_decisions
from fireball_data_processing_spark.plans.agreement import item_disagreement


def _stream(spark, xs, grp=0):
    rows = [(grp, i, x) for i, x in enumerate(xs)]
    return spark.createDataFrame(rows, "g bigint, o bigint, x int")


def _sprt(df, **kw):
    args = dict(p0=0.15, p1=0.25, alpha=0.05, beta=0.05)
    args.update(kw)
    return sprt_decisions(
        df, group_col="g", order_col="o", success=F.col("x") == 1, **args
    )


def test_sprt_all_successes_crosses_upper_at_hand_computed_k(spark):
    # per-success llr = ln(.25/.15) ~ .5108; upper = ln(.95/.05) ~ 2.9444
    # -> first crossing at k = ceil(2.9444/.5108) = 6
    r = _sprt(_stream(spark, [1] * 10)).first()
    assert r["decision"] == "accept_h1"
    assert r["n_at_decision"] == 6
    assert r["n_total"] == 10


def test_sprt_all_failures_crosses_lower(spark):
    # per-failure llr = ln(.75/.85) ~ -.12516 -> k = ceil(2.9444/.12516) = 24
    r = _sprt(_stream(spark, [0] * 30)).first()
    assert r["decision"] == "accept_h0"
    assert r["n_at_decision"] == 24


def test_sprt_short_stream_continues(spark):
    r = _sprt(_stream(spark, [1, 0, 1, 0])).first()
    assert r["decision"] == "continue"
    assert r["n_at_decision"] is None
    assert r["llr_at_decision"] is None
    assert r["n_total"] == 4


def test_sprt_first_crossing_wins_even_if_llr_later_reverses(spark):
    # six successes cross the upper boundary at k=6; a long run of
    # failures afterwards drags the final llr down, but the decision is
    # the FIRST crossing
    xs = [1] * 6 + [0] * 60
    r = _sprt(_stream(spark, xs)).first()
    assert r["decision"] == "accept_h1"
    assert r["n_at_decision"] == 6
    assert r["llr_final"] < r["llr_at_decision"]


def test_sprt_groups_are_independent(spark):
    rows = [(0, i, 1) for i in range(10)] + [(1, i, 0) for i in range(30)]
    df = spark.createDataFrame(rows, "g bigint, o bigint, x int")
    got = {r["group"]: r["decision"] for r in _sprt(df).collect()}
    assert got == {0: "accept_h1", 1: "accept_h0"}


def _ratings(spark, votes):
    rows = [(item, lab) for item, labs in votes.items() for lab in labs]
    return spark.createDataFrame(rows, "item bigint, label string")


def test_disagreement_unanimous_item_zero_entropy(spark):
    out = item_disagreement(_ratings(spark, {1: ["a", "a", "a"]})).first()
    assert out["entropy_bits"] == 0.0
    assert out["norm_entropy"] == 0.0
    assert out["majority_share"] == 1.0
    assert out["n_labels"] == 1


def test_disagreement_even_split_is_one_bit_norm_one(spark):
    out = item_disagreement(_ratings(spark, {1: ["a", "a", "b", "b"]})).first()
    assert out["entropy_bits"] == 1.0
    assert out["norm_entropy"] == 1.0
    assert out["majority_share"] == 0.5


def test_disagreement_three_way_split(spark):
    out = item_disagreement(_ratings(spark, {1: ["a", "b", "c"]})).first()
    assert abs(out["entropy_bits"] - math.log2(3)) < 1e-6
    assert out["norm_entropy"] == 1.0
    assert out["n_votes"] == 3 and out["n_labels"] == 3


def test_exp_decay_weight_hand_values(spark):
    day = 86400 * 10**9
    df = spark.createDataFrame(
        [(0, 7 * day), (3 * day, 7 * day), (7 * day, 7 * day)],
        "ts bigint, ref bigint",
    )
    got = [
        r["w"]
        for r in df.select(
            exp_decay_weight(F.col("ts"), F.col("ref"), 7.0).alias("w")
        ).collect()
    ]
    assert got[0] == 0.5  # one full half-life old
    assert abs(got[1] - 0.5 ** (4 / 7)) < 1e-7
    assert got[2] == 1.0  # zero age
