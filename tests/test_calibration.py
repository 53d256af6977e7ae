"""Calibration operators (operators/calibration.py): Newton logistic fit
against a known separable relationship, conformal coverage near 1-alpha."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.calibration import (
    conformal_threshold,
    logistic_fit_2param,
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
