"""Distribution drift: parity with a literal Python PSI/KL computation,
including appearing/disappearing buckets."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.drift import distribution_drift


def _naive(before, after):
    cats = sorted(set(before) | set(after))
    nb = {c: before.count(c) for c in cats}
    na = {c: after.count(c) for c in cats}
    tb, ta, k = len(before), len(after), len(cats)
    out = {}
    for c in cats:
        p = (nb[c] + 1) / (tb + k)
        q = (na[c] + 1) / (ta + k)
        out[c] = (
            nb[c],
            na[c],
            round(p, 6),
            round(q, 6),
            round((q - p) * math.log(q / p), 6),
            round(p * math.log(p / q), 6),
        )
    return out


def test_drift_matches_naive_with_new_and_gone_buckets(spark):
    before = ["en"] * 6 + ["de"] * 3 + ["fr"]  # fr vanishes
    after = ["en"] * 4 + ["de"] * 5 + ["es"]  # es appears
    b = spark.createDataFrame([(x,) for x in before], ["lang"])
    a = spark.createDataFrame([(x,) for x in after], ["lang"])
    got = {
        r.bucket: (
            r.n_before,
            r.n_after,
            r.p_before,
            r.p_after,
            r.psi_term,
            r.kl_term,
        )
        for r in distribution_drift(b, a, F.col("lang")).collect()
    }
    assert got == _naive(before, after)
    # every PSI term is non-negative ((q-p) and ln(q/p) share sign)
    assert all(v[4] >= 0 for v in got.values())


def test_drift_null_bucket_is_one_category(spark):
    # NULL buckets (missing source/lang) must merge across snapshots,
    # not split into two half-counted rows
    before = ["en", None, None, None]
    after = ["en", "en", None, None]
    b = spark.createDataFrame([(x,) for x in before], "lang string")
    a = spark.createDataFrame([(x,) for x in after], "lang string")
    got = {
        r.bucket: (r.n_before, r.n_after)
        for r in distribution_drift(b, a, F.col("lang")).collect()
    }
    assert set(got) == {"en", None}
    assert got[None] == (3, 2)
    assert got["en"] == (1, 2)


def test_drift_identical_distributions_score_zero(spark):
    rows = [("en",), ("de",), ("en",)]
    b = spark.createDataFrame(rows, ["lang"])
    a = spark.createDataFrame(rows, ["lang"])
    out = distribution_drift(b, a, F.col("lang")).collect()
    assert all(r.psi_term == 0.0 and r.kl_term == 0.0 for r in out)
