"""Distribution drift: parity with a literal Python PSI/KL computation,
including appearing/disappearing buckets."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.drift import (
    distribution_drift,
    jsd_matrix,
)


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


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "d string, t string")


def test_jsd_identical_distributions_zero(spark):
    rows = [("a", t) for t in "xxyyz"] + [("b", t) for t in "xxyyz"]
    out = jsd_matrix(_tok_df(spark, rows), "d", "t").collect()
    assert len(out) == 1
    assert out[0]["jsd_bits"] == 0.0
    assert out[0]["n_shared_tokens"] == 3


def test_jsd_disjoint_vocabularies_one_bit(spark):
    rows = [("a", t) for t in "xy"] + [("b", t) for t in "uv"]
    out = jsd_matrix(_tok_df(spark, rows), "d", "t").collect()
    assert len(out) == 1
    assert out[0]["n_shared_tokens"] == 0
    assert out[0]["jsd_bits"] == 1.0


def test_jsd_hand_computed_half_overlap(spark):
    # P = {x: 1.0}; Q = {x: .5, y: .5}
    # m_x = .75, m_y = .25
    # jsd = .5*1*log2(1/.75) + .5*(.5*log2(.5/.75) + .5*log2(.5/.25))
    import math

    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")]
    out = jsd_matrix(_tok_df(spark, rows), "d", "t").collect()
    exp = 0.5 * math.log2(1 / 0.75) + 0.5 * (
        0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(0.5 / 0.25)
    )
    assert abs(out[0]["jsd_bits"] - exp) < 1e-6


def test_jsd_matrix_all_pairs_present_and_ordered(spark):
    rows = (
        [("a", "x")] * 3
        + [("b", "y")] * 2
        + [("c", "x"), ("c", "y")]
        + [("d", "z")]
    )
    out = jsd_matrix(_tok_df(spark, rows), "d", "t").collect()
    pairs = [(r["domain_a"], r["domain_b"]) for r in out]
    assert pairs == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    by = {(r["domain_a"], r["domain_b"]): r for r in out}
    # disjoint pairs read exactly 1 bit off the broadcast pair frame
    assert by[("a", "b")]["jsd_bits"] == 1.0
    assert by[("a", "d")]["jsd_bits"] == 1.0
    assert 0.0 < by[("a", "c")]["jsd_bits"] < 1.0


def test_jsd_partitioning_invariance(spark):
    rows = [(f"d{i % 3}", f"t{(i * 7) % 11}") for i in range(300)]
    a = jsd_matrix(_tok_df(spark, rows).repartition(1), "d", "t").collect()
    b = jsd_matrix(_tok_df(spark, rows).repartition(32), "d", "t").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cusum_identity_against_literal_recursion(spark):
    from fireball_data_processing_spark.operators.drift import cusum_alarm

    xs = [0.10, 0.12, 0.09, 0.20, 0.22, 0.21, 0.08, 0.25]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t bigint, v double"
    )
    out = cusum_alarm(
        df, "t", "v", target=0.10, allowance=0.02, threshold=0.15
    ).collect()
    # literal clamped recursion
    s, want = 0.0, []
    for x in xs:
        s = max(0.0, s + (x - 0.12))
        want.append(round(s, 6))
    got = [r["cusum"] for r in out]
    assert all(abs(g - w) < 1e-6 for g, w in zip(got, want)), (got, want)
    assert [r["alarm"] for r in out] == [w > 0.15 for w in want]


def test_cusum_in_control_series_never_alarms(spark):
    from fireball_data_processing_spark.operators.drift import cusum_alarm

    xs = [0.10 + 0.001 * ((i * 7) % 5 - 2) for i in range(50)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t bigint, v double"
    )
    out = cusum_alarm(
        df, "t", "v", target=0.10, allowance=0.01, threshold=0.05
    ).collect()
    assert not any(r["alarm"] for r in out)
    assert all(r["cusum"] >= 0.0 for r in out)


def test_cusum_detects_persistent_small_shift(spark):
    from fireball_data_processing_spark.operators.drift import cusum_alarm

    # +0.02 persistent shift after t=25, each point individually tiny
    xs = [0.10] * 25 + [0.12] * 25
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t bigint, v double"
    )
    out = cusum_alarm(
        df, "t", "v", target=0.10, allowance=0.005, threshold=0.1
    ).collect()
    alarms = [r["time"] for r in out if r["alarm"]]
    assert alarms and min(alarms) > 25  # fires after the shift, not before


def test_ewma_identity_against_literal_recursion(spark):
    from fireball_data_processing_spark.operators.drift import ewma_chart

    xs = [0.1, 0.15, 0.08, 0.2, 0.12, 0.3, 0.1]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t bigint, v double"
    )
    out = ewma_chart(
        df, "t", "v", mu0=0.1, sigma0=0.05, lam=0.2, width=3.0
    ).collect()
    e, want = 0.1, []
    for x in xs:
        e = 0.2 * x + 0.8 * e
        want.append(e)
    got = [r["ewma"] for r in out]
    assert all(abs(g - w) < 1e-5 for g, w in zip(got, want)), (got, want)
    # band grows monotonically toward the asymptote
    bands = [r["band"] for r in out]
    assert bands == sorted(bands)


def test_ewma_flat_series_never_alarms(spark):
    from fireball_data_processing_spark.operators.drift import ewma_chart

    df = spark.createDataFrame(
        [(i, 0.1) for i in range(30)], "t bigint, v double"
    )
    out = ewma_chart(df, "t", "v", mu0=0.1, sigma0=0.02).collect()
    assert not any(r["alarm"] for r in out)
    assert all(abs(r["ewma"] - 0.1) < 1e-6 for r in out)


def test_theil_sen_exact_line_recovered(spark):
    from fireball_data_processing_spark.operators.drift import theil_sen

    rows = [(float(t), 2.5 * t + 1.0) for t in range(10)]
    df = spark.createDataFrame(rows, "t double, v double")
    r = theil_sen(df, "t", "v").first()
    assert r["slope"] == 2.5
    assert r["intercept"] == 1.0
    assert r["n_pairs"] == 45


def test_theil_sen_robust_to_single_outlier(spark):
    from fireball_data_processing_spark.operators.drift import theil_sen

    rows = [(float(t), 2.0 * t) for t in range(20)]
    rows[10] = (10.0, 1000.0)  # one crazy day
    df = spark.createDataFrame(rows, "t double, v double")
    r = theil_sen(df, "t", "v").first()
    assert abs(r["slope"] - 2.0) < 0.05  # OLS would be wrecked


def test_theil_sen_grouped_independent(spark):
    from fireball_data_processing_spark.operators.drift import theil_sen

    rows = [("up", float(t), 3.0 * t) for t in range(8)] + [
        ("down", float(t), -1.0 * t + 5) for t in range(8)
    ]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {
        r["g"]: r["slope"]
        for r in theil_sen(df, "t", "v", group_col="g").collect()
    }
    assert got == {"up": 3.0, "down": -1.0}


def _acf_literal(ys, max_lag):
    n = len(ys)
    mu = round(sum(ys) / n, 8)
    e = [y - mu for y in ys]
    den = round(sum(x * x for x in e), 8)
    out = {}
    q = 0.0
    for k in range(1, max_lag + 1):
        num = round(sum(e[i] * e[i + k] for i in range(n - k)), 8)
        rho = round(num / den, 8)
        q += round(rho * rho / (n - k), 8)
        out[k] = (rho, n * (n + 2.0) * q)
    return out


def test_acf_alternating_series_hand_computed(spark):
    from fireball_data_processing_spark.operators.drift import acf_profile
    from pyspark.sql import functions as F

    ys = [1.0, 3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 3.0]
    df = spark.createDataFrame(
        [(float(t), y) for t, y in enumerate(ys)], "t double, v double"
    )
    got = {
        r["lag"]: (r["rho"], r["q_stat"])
        for r in acf_profile(df, "t", "v", max_lag=3).collect()
    }
    want = _acf_literal(ys, 3)
    for k in (1, 2, 3):
        assert abs(got[k][0] - round(want[k][0], 6)) < 1e-6
        assert abs(got[k][1] - round(want[k][1], 6)) < 1e-6
    # alternating series: strong negative lag-1, positive lag-2
    assert got[1][0] < -0.8 and got[2][0] > 0.7


def test_acf_grouped_and_gapped_series(spark):
    from fireball_data_processing_spark.operators.drift import acf_profile
    from pyspark.sql import functions as F

    rows = []
    for t in range(12):
        rows.append(("a", float(t), float(t % 3)))
        if t != 5:  # group b has a gap at t=5
            rows.append(("b", float(t), float(t)))
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out = acf_profile(df, "t", "v", group_col="g", max_lag=2).collect()
    by = {(r["g"], r["lag"]): r for r in out}
    # every (group, lag) present; gap only drops pairs, never crashes
    assert set(by) == {("a", 1), ("a", 2), ("b", 1), ("b", 2)}
    assert by[("b", 1)]["n_points"] == 11
    # a strongly increasing series has high positive lag-1 rho
    assert by[("b", 1)]["rho"] > 0.5
