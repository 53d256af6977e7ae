"""Trimmed/winsorized means, capture-recapture, PCA projection:
hand-computed checks on the batch-9 query building blocks."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_trimmed_and_winsorized_hand_case(spark):
    # values 0..9 plus outlier 1000: q10/q90 of [0..9, 1000]
    vals = [float(i) for i in range(10)] + [1000.0]
    df = spark.createDataFrame([("t", v) for v in vals], "g string, v double")
    q = df.groupBy("g").agg(
        F.round(F.percentile(F.col("v"), F.lit(0.1)), 8).alias("q10"),
        F.round(F.percentile(F.col("v"), F.lit(0.9)), 8).alias("q90"),
    )
    j = df.join(F.broadcast(q), "g")
    inside = (F.col("v") >= F.col("q10")) & (F.col("v") <= F.col("q90"))
    r = j.groupBy("g").agg(
        F.avg(F.when(inside, F.col("v"))).alias("trimmed"),
        F.avg(
            F.least(F.greatest(F.col("v"), F.col("q10")), F.col("q90"))
        ).alias("winsor"),
        F.avg("v").alias("mean"),
    ).first()
    # the outlier blows up the mean but not the robust pair
    assert r["mean"] > 90
    assert r["trimmed"] < 10
    assert r["winsor"] < 20


def test_chapman_estimator_formula(spark):
    from fireball_data_processing_spark.functions.text import normalize_text

    rows = (
        [(i, "src0", f"doc {i}") for i in range(10)]
        + [(100 + i, "src1", f"doc {i}") for i in range(5)]  # 5 overlap
        + [(200 + i, "src1", f"other {i}") for i in range(5)]
    )
    d = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    h = F.md5(normalize_text(F.col("text"))).alias("h")
    a = d.filter(F.col("source") == "src0").select(h).distinct()
    b = d.filter(F.col("source") == "src1").select(h).distinct()
    na, nb = a.count(), b.count()
    m = a.join(b, "h").count()
    assert (na, nb, m) == (10, 10, 5)
    # Chapman: (11*11)/6 - 1 = 19.1666...
    est = (na + 1) * (nb + 1) / (m + 1) - 1
    assert abs(est - 19.166667) < 1e-4


def test_pca_projection_separates_known_labels(spark):
    from fireball_data_processing_spark.operators.pca import (
        pca_fit,
        pca_project_expr,
    )

    # label 0 near -10 on axis 0, label 1 near +10: projections must
    # separate cleanly with opposite signs per label
    rows = [
        (i, [(-10.0 if i % 2 == 0 else 10.0) + (i % 3) * 0.1, 0.0, 0.0, 0.0],
         i % 2)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    mu, v, nrm, tot = pca_fit(df, "embedding", dim=4, n_iter=8)
    proj = pca_project_expr("embedding", mu, v)
    got = (
        df.select("label", proj.alias("s"))
        .groupBy("label")
        .agg(F.avg("s").alias("m"))
        .collect()
    )
    means = {r["label"]: r["m"] for r in got}
    assert means[0] * means[1] < 0  # opposite sides of the mean
    assert abs(means[0]) > 5 and abs(means[1]) > 5
    assert nrm / tot > 0.99  # essentially all scatter on the axis
