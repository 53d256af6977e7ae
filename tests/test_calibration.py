"""Calibration operators (operators/calibration.py): Newton logistic fit
against a known separable relationship, conformal coverage near 1-alpha."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.calibration import (
    conformal_threshold,
    logistic_fit_2param,
    reliability_diagram,
)


def test_logistic_fit_recovers_direction_and_reduces_logloss(spark):
    # y is (noisily) increasing in x -> slope must come out positive and
    # the fit must beat the b=(0,0) baseline logloss ln(2)
    rows = [(i / 100.0, 1.0 if i >= 45 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = logistic_fit_2param(df, "x", "y", n_iter=3).first()
    assert out["slope"] > 0.0
    assert out["n"] == 100
    assert out["logloss"] < math.log(2.0)


def test_logistic_fit_balanced_symmetric_intercept_zero(spark):
    # perfectly symmetric data around x=0.5 with y = x>0.5: intercept
    # and slope satisfy b0 = -b1/2 (decision boundary at 0.5)
    rows = [((i + 0.5) / 10.0, 1.0 if i >= 5 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = logistic_fit_2param(df, "x", "y", n_iter=2).first()
    assert abs(out["intercept"] + out["slope"] / 2.0) < 1e-4


def test_logistic_fit_deterministic_across_partitionings(spark):
    rows = [(i / 50.0, float(i % 2)) for i in range(200)]
    df1 = spark.createDataFrame(rows, "x double, y double").repartition(1)
    df32 = spark.createDataFrame(rows, "x double, y double").repartition(32)
    a = logistic_fit_2param(df1, "x", "y").first()
    b = logistic_fit_2param(df32, "x", "y").first()
    assert a == b


def test_conformal_coverage_near_alpha(spark):
    rows = [(i, float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, s double")
    out = conformal_threshold(
        df, "s", key=F.col("doc_id"), alpha=0.1, cal_fraction=0.5
    ).first()
    assert out["n_cal"] + out["n_test"] == 2000
    # exchangeable scores: held-out pass rate concentrates near 0.9
    assert 0.85 <= out["test_pass_rate"] <= 0.95, out["test_pass_rate"]


def test_reliability_equal_mass_bins_and_ece(spark):
    # y increasing in x -> a sane fit; equal-mass bins must each hold
    # ~n/10 rows and ECE must equal the support-weighted mean gap
    rows = [(i, i / 200.0, 1.0 if (i * 7) % 200 < i else 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, x double, y double")
    out = reliability_diagram(
        df, "x", "y", key_col="doc_id", n_iter=2, n_bins=10
    ).collect()
    assert [r["bin"] for r in out] == list(range(1, 11))
    assert all(r["n"] == 20 for r in out)
    n_tot = sum(r["n"] for r in out)
    ece = sum(r["n"] * r["gap"] for r in out) / n_tot
    assert all(abs(r["ece"] - round(ece, 6)) < 1e-9 for r in out)
    # avg_conf must be nondecreasing across equal-mass bins (sorted by p)
    confs = [r["avg_conf"] for r in out]
    assert confs == sorted(confs)


def test_reliability_equal_width_mode_no_key(spark):
    # equal-width mode: bins are floor(p*10) values, no sort needed;
    # perfectly calibrated constant predictor -> gap 0, ece 0
    rows = [(i / 100.0, 1.0 if i % 2 == 0 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = reliability_diagram(df, "x", "y", n_iter=0, n_bins=10).collect()
    # n_iter=0 -> b0=b1=0 -> p=0.5 for every row, one bin, acc=0.5
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 5 and r["n"] == 100
    assert r["avg_conf"] == 0.5 and r["avg_acc"] == 0.5
    assert r["gap"] == 0.0 and r["ece"] == 0.0


def test_isotonic_monotone_and_mean_preserving(spark):
    from fireball_data_processing_spark.operators.calibration import (
        isotonic_bucket_fit,
    )

    # noisy but increasing relationship
    rows = [
        (i, i / 100.0, 1.0 if (i * 13) % 100 < i else 0.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, x double, y double")
    out = isotonic_bucket_fit(df, "x", "y", "doc_id", n_buckets=10).collect()
    iso = [r["iso_rate"] for r in out]
    assert iso == sorted(iso)  # non-decreasing by construction
    # weighted mean preservation (PAV property): sum n*iso == sum n*raw
    wi = sum(r["n"] * r["iso_rate"] for r in out)
    wr = sum(r["n"] * r["raw_rate"] for r in out)
    assert abs(wi - wr) < 1e-2


def test_isotonic_already_monotone_is_identity(spark):
    from fireball_data_processing_spark.operators.calibration import (
        isotonic_bucket_fit,
    )

    # strictly increasing bucket rates: PAV must not pool anything
    rows = []
    k = 0
    for b in range(5):
        for j in range(20):
            rows.append((k, float(b), 1.0 if j < 4 * b else 0.0))
            k += 1
    df = spark.createDataFrame(rows, "doc_id bigint, x double, y double")
    out = isotonic_bucket_fit(df, "x", "y", "doc_id", n_buckets=5).collect()
    for r in out:
        assert abs(r["iso_rate"] - r["raw_rate"]) < 1e-6


def test_isotonic_pools_a_violation(spark):
    from fireball_data_processing_spark.operators.calibration import (
        isotonic_bucket_fit,
    )

    # bucket rates 0.2, 0.8, 0.4 (violation): PAV pools the last two to
    # their weighted mean 0.6
    rows = []
    k = 0
    for b, rate in enumerate([0.2, 0.8, 0.4]):
        for j in range(10):
            rows.append((k, float(b), 1.0 if j < rate * 10 else 0.0))
            k += 1
    df = spark.createDataFrame(rows, "doc_id bigint, x double, y double")
    out = isotonic_bucket_fit(df, "x", "y", "doc_id", n_buckets=3).collect()
    got = [r["iso_rate"] for r in out]
    assert abs(got[0] - 0.2) < 1e-6
    assert abs(got[1] - 0.6) < 1e-6
    assert abs(got[2] - 0.6) < 1e-6
