"""Kaplan-Meier curve (operators/survival.py) and delete-one-shard
jackknife (operators/bootstrap.py): hand-computed curves and SE."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.bootstrap import jackknife_se
from fireball_data_processing_spark.operators.survival import km_curve


def _subj(spark, rows):
    return spark.createDataFrame(rows, "duration bigint, event boolean")


def test_km_no_censoring_matches_empirical_survival(spark):
    # all events at durations 1,2,3,4 (one each): S(t) = 1 - t/4
    rows = [(t, True) for t in (1, 2, 3, 4)]
    out = {r["duration"]: r for r in km_curve(_subj(spark, rows)).collect()}
    assert out[1]["n_risk"] == 4 and abs(out[1]["survival"] - 0.75) < 1e-6
    assert abs(out[2]["survival"] - 0.50) < 1e-6
    assert abs(out[3]["survival"] - 0.25) < 1e-6
    assert out[4]["survival"] == 0.0  # d == n boundary -> exactly zero


def test_km_censoring_shrinks_risk_set_not_survival(spark):
    # event at 1 (n=4 -> S=3/4), censor at 2, event at 3 (risk 2 ->
    # S = 3/4 * 1/2 = 3/8), censor at 4
    rows = [(1, True), (2, False), (3, True), (4, False)]
    out = {r["duration"]: r for r in km_curve(_subj(spark, rows)).collect()}
    assert abs(out[1]["survival"] - 0.75) < 1e-6
    assert out[2]["n_censored"] == 1
    assert abs(out[2]["survival"] - 0.75) < 1e-6  # censoring: no drop
    assert out[3]["n_risk"] == 2
    assert abs(out[3]["survival"] - 0.375) < 1e-6
    assert abs(out[4]["survival"] - 0.375) < 1e-6


def test_km_partitioning_invariance(spark):
    rows = [((i * 7) % 13, i % 3 != 0) for i in range(200)]
    df1 = _subj(spark, rows).repartition(1)
    df32 = _subj(spark, rows).repartition(32)
    a = [tuple(r) for r in km_curve(df1).collect()]
    b = [tuple(r) for r in km_curve(df32).collect()]
    assert a == b


def test_jackknife_zero_variance_data(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(100)], "doc_id bigint, x double"
    )
    r = jackknife_se(df, "x", key=F.col("doc_id"), n_groups=8).first()
    assert r["mean"] == 5.0
    assert r["jackknife_se"] == 0.0
    assert r["n"] == 100 and r["n_groups"] == 8


def test_jackknife_se_tracks_classical_se_iid(spark):
    # iid-ish values: delete-one-group jackknife SE should land near
    # the classical sigma/sqrt(n)
    vals = [math.sin(i * 1.7) * 2.0 for i in range(2000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id bigint, x double"
    )
    r = jackknife_se(df, "x", key=F.col("doc_id"), n_groups=32).first()
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    classical = math.sqrt(var / len(vals))
    assert 0.5 * classical < r["jackknife_se"] < 2.0 * classical


def test_jackknife_partitioning_invariance(spark):
    rows = [(i, float((i * 13) % 29)) for i in range(500)]
    a = jackknife_se(
        spark.createDataFrame(rows, "doc_id bigint, x double").repartition(1),
        "x", key=F.col("doc_id"),
    ).first()
    b = jackknife_se(
        spark.createDataFrame(rows, "doc_id bigint, x double").repartition(32),
        "x", key=F.col("doc_id"),
    ).first()
    assert a == b


def test_logrank_identical_groups_z_zero(spark):
    from fireball_data_processing_spark.operators.survival import logrank_test

    rows = [(g, t, True) for g in ("a", "b") for t in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, duration bigint, event boolean")
    r = logrank_test(df, "g").first()
    assert r["group_a"] == "a" and r["group_b"] == "b"
    assert r["o_minus_e"] == 0.0
    assert r["z"] == 0.0


def test_logrank_clearly_faster_group_is_negative_for_slow_first_group(spark):
    from fireball_data_processing_spark.operators.survival import logrank_test

    # group 'a' converts late (t 10..14), 'b' early (t 1..5): a has
    # FEWER early events than expected -> O1 - E1 < 0 -> z < 0
    rows = [("a", 10 + i, True) for i in range(5)] + [
        ("b", 1 + i, True) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, duration bigint, event boolean")
    r = logrank_test(df, "g").first()
    assert r["z"] < -1.5
    assert r["n_a"] == 5 and r["n_b"] == 5


def test_logrank_censoring_enters_risk_sets_only(spark):
    from fireball_data_processing_spark.operators.survival import logrank_test

    # pure-censoring rows contribute no events but keep subjects at
    # risk; with all events shared equally the statistic stays 0
    rows = (
        [("a", 1, True), ("b", 1, True)]
        + [("a", 5, False), ("b", 5, False)]
    )
    df = spark.createDataFrame(rows, "g string, duration bigint, event boolean")
    r = logrank_test(df, "g").first()
    assert r["o_minus_e"] == 0.0
