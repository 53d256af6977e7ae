"""Poisson bootstrap (operators/bootstrap.py): CI sanity (covers the
true mean, tightens with n), ladder correctness, determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.bootstrap import (
    _POISSON1_CDF,
    bootstrap_mean_ci,
    poisson_count_expr,
)


def test_poisson_ladder_matches_cdf_constants(spark):
    # thresholds are the Poisson(1) CDF at k=0..3
    want = [math.exp(-1) * s for s in (1.0, 2.0, 2.5, 8.0 / 3.0)]
    assert all(abs(a - b) < 1e-9 for a, b in zip(_POISSON1_CDF, want))
    df = spark.range(1).select(
        *[
            poisson_count_expr(F.lit(u)).alias(f"k{i}")
            for i, u in enumerate([0.1, 0.5, 0.8, 0.95, 0.999])
        ]
    )
    r = df.first()
    assert [r[f"k{i}"] for i in range(5)] == [0, 1, 2, 3, 4]


def test_bootstrap_ci_covers_true_mean_and_tightens(spark):
    rows_s = [(i, float(i % 10)) for i in range(200)]
    rows_l = [(i, float(i % 10)) for i in range(5000)]
    small = spark.createDataFrame(rows_s, "id bigint, v double")
    large = spark.createDataFrame(rows_l, "id bigint, v double")
    cs = bootstrap_mean_ci(small, "v", key=F.col("id")).first()
    cl = bootstrap_mean_ci(large, "v", key=F.col("id")).first()
    assert cs["ci_lo"] <= cs["mean"] <= cs["ci_hi"]
    assert cl["ci_lo"] <= cl["mean"] <= cl["ci_hi"]
    assert (cl["ci_hi"] - cl["ci_lo"]) < (cs["ci_hi"] - cs["ci_lo"])
    assert cs["n_replicates"] == 32


def test_bootstrap_deterministic_across_partitionings(spark):
    rows = [(i, float((i * 7) % 23)) for i in range(500)]
    a = bootstrap_mean_ci(
        spark.createDataFrame(rows, "id bigint, v double").repartition(1),
        "v", key=F.col("id"),
    ).first()
    b = bootstrap_mean_ci(
        spark.createDataFrame(rows, "id bigint, v double").repartition(32),
        "v", key=F.col("id"),
    ).first()
    assert a == b


def test_delta_ci_detects_real_lift_and_null_effect(spark):
    from fireball_data_processing_spark.operators.bootstrap import (
        bootstrap_delta_ci,
    )

    # variant b is uniformly +5: the CI must exclude zero and bracket 5
    rows = [(i, "a", float(i % 10)) for i in range(500)] + [
        (i + 500, "b", float(i % 10) + 5.0) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    r = bootstrap_delta_ci(
        df, "v", key=F.col("id"), variant_col="g", variant_a="a",
        variant_b="b",
    ).first()
    assert r["n_a"] == 500 and r["n_b"] == 500
    assert r["delta"] == 5.0
    assert 0.0 < r["ci_lo"] <= 5.0 <= r["ci_hi"]

    # identical populations: the CI must straddle zero
    null_rows = [(i, "a" if i % 2 else "b", float(i % 7)) for i in range(1000)]
    df0 = spark.createDataFrame(null_rows, "id bigint, g string, v double")
    r0 = bootstrap_delta_ci(
        df0, "v", key=F.col("id"), variant_col="g", variant_a="a",
        variant_b="b",
    ).first()
    assert r0["ci_lo"] <= 0.0 <= r0["ci_hi"], (r0["ci_lo"], r0["ci_hi"])


def test_delta_ci_ignores_other_variants(spark):
    from fireball_data_processing_spark.operators.bootstrap import (
        bootstrap_delta_ci,
    )

    rows = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 99.0)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    r = bootstrap_delta_ci(
        df, "v", key=F.col("id"), variant_col="g", variant_a="a",
        variant_b="b",
    ).first()
    assert r["n_a"] == 1 and r["n_b"] == 1
    assert r["mean_a"] == 1.0 and r["mean_b"] == 2.0


# ------------------------------------------------------------------- RBO


def _ranked(spark, ids):
    return spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(ids)], "doc_id bigint, rank int"
    )


def test_rbo_identical_rankings_is_one(spark):
    from fireball_data_processing_spark.operators.evalmetrics import rbo_at_k

    a = _ranked(spark, [1, 2, 3, 4, 5])
    r = rbo_at_k(a, _ranked(spark, [1, 2, 3, 4, 5]), k=5, p=0.9).first()
    # identical prefixes: X_d = d at every depth -> rbo = (1-p) sum p^(d-1)
    want = round(0.1 * sum(round(0.9 ** (d - 1), 12) for d in range(1, 6)), 6)
    assert abs(r["rbo"] - want) < 1e-9
    assert r["overlap_at_k"] == 1.0


def test_rbo_disjoint_rankings_is_zero(spark):
    from fireball_data_processing_spark.operators.evalmetrics import rbo_at_k

    r = rbo_at_k(
        _ranked(spark, [1, 2, 3]), _ranked(spark, [4, 5, 6]), k=3, p=0.9
    ).first()
    assert r["rbo"] == 0.0 and r["overlap_at_k"] == 0.0


def test_rbo_literal_python_parity(spark):
    from fireball_data_processing_spark.operators.evalmetrics import rbo_at_k

    la, lb, k, p = [3, 1, 4, 5, 9], [1, 2, 3, 4, 8], 5, 0.9
    got = rbo_at_k(_ranked(spark, la), _ranked(spark, lb), k=k, p=p).first()
    want = 0.0
    for d in range(1, k + 1):
        xd = len(set(la[:d]) & set(lb[:d]))
        want += round(p ** (d - 1), 12) * xd / d
    want = round((1 - p) * want, 6)
    assert abs(got["rbo"] - want) < 1e-9


def test_rbo_top_weighted(spark):
    from fireball_data_processing_spark.operators.evalmetrics import rbo_at_k

    # same set, agreement AT THE TOP vs at the bottom: top wins
    a = _ranked(spark, [1, 2, 3, 4])
    top = rbo_at_k(a, _ranked(spark, [1, 2, 4, 3]), k=4, p=0.9).first()
    bottom = rbo_at_k(a, _ranked(spark, [2, 1, 3, 4]), k=4, p=0.9).first()
    assert top["rbo"] > bottom["rbo"]
