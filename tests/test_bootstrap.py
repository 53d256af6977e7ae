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
