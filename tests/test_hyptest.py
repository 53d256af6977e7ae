"""Hypothesis-test statistics (operators/hyptest.py) and the
doubly-robust OPE estimator (operators/ope.py): hand-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.hyptest import (
    chi2_association,
    mann_whitney_u,
)
from fireball_data_processing_spark.operators.ope import dr_value


def _vals(spark, a, b):
    rows = [(float(v), 0) for v in a] + [(float(v), 1) for v in b]
    return spark.createDataFrame(rows, "v double, b int")


def test_mw_identical_samples_z_zero(spark):
    df = _vals(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    r = mann_whitney_u(df, "v", F.col("b") == 1).first()
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["u_a"] == 8.0  # na*nb/2
    assert r["z"] == 0.0


def test_mw_complete_separation(spark):
    df = _vals(spark, [10, 11, 12], [1, 2, 3])
    r = mann_whitney_u(df, "v", F.col("b") == 1).first()
    assert r["u_a"] == 9.0  # na*nb: every A beats every B
    assert r["z"] > 1.9


def test_mw_hand_computed_with_ties(spark):
    # A=[1,2], B=[1,3]: midranks 1.5,1.5,3,4 -> u_a=1.5,
    # tie-corrected var=1.5 -> z=(1.5-2)/sqrt(1.5)=-0.408248
    df = _vals(spark, [1, 2], [1, 3])
    r = mann_whitney_u(df, "v", F.col("b") == 1).first()
    assert r["u_a"] == 1.5
    assert abs(r["z"] - (-0.408248)) < 1e-6


def _cat(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_chi2_independent_table_zero(spark):
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 5 + [("r2", "c2")] * 10
    )
    r = chi2_association(_cat(spark, rows), "a", "b").first()
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0
    assert r["dof"] == 1


def test_chi2_perfect_association(spark):
    rows = [("r1", "c1")] * 10 + [("r2", "c2")] * 10
    r = chi2_association(_cat(spark, rows), "a", "b").first()
    assert r["chi2"] == 20.0
    assert r["cramers_v"] == 1.0


def test_chi2_zero_observed_cell_contributes_expected_mass(spark):
    # (a, y) never observed: expected 1.5 must still count -> chi2=4.8
    rows = [("a", "x")] * 4 + [("b", "x")] + [("b", "y")] * 3
    r = chi2_association(_cat(spark, rows), "a", "b").first()
    assert abs(r["chi2"] - 4.8) < 1e-6
    assert abs(r["cramers_v"] - 0.774597) < 1e-6


def test_dr_matches_logged_value_when_target_is_logged_policy(spark):
    rows = [(0, "a", 2.0), (0, "b", 4.0), (0, "a", 2.0), (0, "b", 4.0)]
    df = spark.createDataFrame(rows, "context bigint, action string, r double")
    r = dr_value(df, "context", "action", "r", {"a": 0.5, "b": 0.5}).first()
    assert r["dm_value"] == 3.0
    assert r["ips_value"] == 3.0
    assert r["dr_value"] == 3.0


def test_dr_single_action_target(spark):
    # target puts all mass on 'a': DM = q(a) per context; IPS reweights
    # only 'a' rows; DR agrees with the true mean reward of 'a'
    rows = [(0, "a", 1.0), (0, "a", 3.0), (0, "b", 100.0), (0, "b", 100.0)]
    df = spark.createDataFrame(rows, "context bigint, action string, r double")
    r = dr_value(df, "context", "action", "r", {"a": 1.0, "b": 0.0}).first()
    assert r["dm_value"] == 2.0
    assert r["dr_value"] == 2.0


def test_normal_sf_polynomial_accuracy(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        normal_sf_expr,
    )

    # known tails: P(Z>1.959964) ~ .025, P(Z>2.575829) ~ .005, P(Z>0)=.5
    df = spark.createDataFrame(
        [(0.0,), (1.959964,), (2.575829,)], "z double"
    )
    got = [
        r["p"] for r in df.select(normal_sf_expr(F.col("z")).alias("p"))
        .collect()
    ]
    assert abs(got[0] - 0.5) < 1e-7
    assert abs(got[1] - 0.025) < 1e-6
    assert abs(got[2] - 0.005) < 1e-6


def test_bh_hand_case(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        bh_significant,
    )

    # m=5, alpha=.1: thresholds .02, .04, .06, .08, .10
    # p = [.001, .03, .05, .2, .9]: k=3 (.05 <= .06); note rank 2's
    # .03 <= .04 also holds, and rank 4 fails -> significant = first 3
    rows = [(1, 0.001), (2, 0.03), (3, 0.05), (4, 0.2), (5, 0.9)]
    df = spark.createDataFrame(rows, "k bigint, p double")
    got = {
        r["k"]: (r["bh_rank"], r["significant"])
        for r in bh_significant(df, "p", "k", alpha=0.1).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (2, True)
    assert got[3] == (3, True)
    assert got[4] == (4, False)
    assert got[5] == (5, False)


def test_bh_step_up_rescues_earlier_failures(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        bh_significant,
    )

    # step-up property: rank 1 fails its own threshold (.05 > .025) but
    # rank 2 passes (.05 <= .05), so BOTH are significant
    rows = [(1, 0.05), (2, 0.05)]
    df = spark.createDataFrame(rows, "k bigint, p double")
    got = {
        r["k"]: r["significant"]
        for r in bh_significant(df, "p", "k", alpha=0.05).collect()
    }
    assert got == {1: True, 2: True}


def _kw_literal(groups):
    # literal-Python Kruskal-Wallis with midranks + tie correction
    all_v = sorted(v for g in groups.values() for v in g)
    n = len(all_v)
    rank = {}
    i = 0
    while i < len(all_v):
        j = i
        while j < len(all_v) and all_v[j] == all_v[i]:
            j += 1
        rank[all_v[i]] = (i + 1 + j) / 2.0
        i = j
    s = sum(
        sum(rank[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    )
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    ties = {}
    for v in all_v:
        ties[v] = ties.get(v, 0) + 1
    c = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    return h, h / c


def test_kruskal_hand_computed_three_groups(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        kruskal_wallis,
    )

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0], "c": [5.0, 7.0, 9.0]}
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v double, g string")
    r = kruskal_wallis(df, "v", "g").first()
    h, h_adj = _kw_literal(groups)
    assert r["n"] == 9 and r["n_groups"] == 3 and r["dof"] == 2
    assert abs(r["h"] - round(h, 6)) < 1e-6
    assert abs(r["h_adj"] - round(h_adj, 6)) < 1e-6


def test_kruskal_identical_groups_h_zero(spark):
    rows = [(float(v), g) for g in "ab" for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = kruskal_wallis_import(df)
    assert abs(r["h_adj"]) < 1e-9
    assert r["tie_correction"] < 1.0  # every value tied across groups


def kruskal_wallis_import(df):
    from fireball_data_processing_spark.operators.hyptest import (
        kruskal_wallis,
    )

    return kruskal_wallis(df, "v", "g").first()


def test_spearman_perfect_monotone_and_reversed(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        spearman_matrix,
    )

    rows = [(i, float(i), float(i * i), float(10 - i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id bigint, m1 double, m2 double, m3 double")
    out = {
        (r["metric_a"], r["metric_b"]): r["rho"]
        for r in spearman_matrix(
            df, "id",
            {"m1": F.col("m1"), "m2": F.col("m2"), "m3": F.col("m3")},
        ).collect()
    }
    # m2 = m1^2 is a perfect monotone map -> rho exactly 1;
    # m3 = 10 - m1 reverses it -> rho exactly -1
    assert out[("m1", "m2")] == 1.0
    assert out[("m1", "m3")] == -1.0
    assert out[("m2", "m3")] == -1.0


def test_spearman_ties_match_literal_python(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        spearman_matrix,
    )

    x = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    y = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0, 6.0]

    def midranks(vals):
        sv = sorted(vals)
        first = {}
        cnt = {}
        for i, v in enumerate(sv):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        return [first[v] + (cnt[v] - 1) / 2.0 for v in vals]

    rx, ry = midranks(x), midranks(y)
    n = float(len(x))
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    rows = [(i, x[i], y[i]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "id bigint, mx double, my double")
    r = spearman_matrix(
        df, "id", {"mx": F.col("mx"), "my": F.col("my")}
    ).first()
    assert abs(r["rho"] - round(rho, 6)) < 1e-6


def test_mcnemar_hand_computed(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        mcnemar_paired,
    )

    # both=3, a_only=6, b_only=2, neither=1 -> chi2_cc=(|6-2|-1)^2/8=1.125
    rows = (
        [(True, True)] * 3 + [(True, False)] * 6
        + [(False, True)] * 2 + [(False, False)] * 1
    )
    df = spark.createDataFrame(rows, "ga boolean, gb boolean")
    r = mcnemar_paired(df, F.col("ga"), F.col("gb")).first()
    assert (r["n"], r["both_pass"], r["a_only"], r["b_only"], r["neither"]) == (
        12, 3, 6, 2, 1,
    )
    assert r["chi2_cc"] == 1.125


def test_mcnemar_no_discordance_null_stat_and_null_gates(spark):
    from fireball_data_processing_spark.operators.hyptest import (
        mcnemar_paired,
    )

    rows = [(True, True), (False, False), (None, None)]
    df = spark.createDataFrame(rows, "ga boolean, gb boolean")
    r = mcnemar_paired(df, F.col("ga"), F.col("gb")).first()
    # nulls coalesce to fail; zero discordant pairs -> stat undefined
    assert (r["both_pass"], r["neither"]) == (1, 2)
    assert r["chi2_cc"] is None


def test_cochran_q_hand_computed(spark):
    from fireball_data_processing_spark.operators.hyptest import cochran_q

    # rows (a,b,c): classic 3-gate table; L_i and G_j by hand:
    # G = (4, 2, 1), T = 7, sum L^2 = 4+4+1+4+0+0 = 13
    rows = [
        (True, True, False),
        (True, False, True),
        (True, False, False),
        (True, True, False),
        (False, False, False),
        (None, None, None),
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    import pyspark.sql.functions as F

    r = cochran_q(
        df, {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    ).first()
    assert (r["n"], r["k"], r["dof"]) == (6, 3, 2)
    assert (r["pass_a"], r["pass_b"], r["pass_c"]) == (4, 2, 1)
    # Q = 2*(3*(16+4+1) - 49) / (3*7 - 13) = 2*14/8 = 3.5
    assert r["q"] == 3.5


def test_cochran_q_unanimous_rows_null(spark):
    from fireball_data_processing_spark.operators.hyptest import cochran_q
    import pyspark.sql.functions as F

    rows = [(True, True), (False, False)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cochran_q(df, {"a": F.col("a"), "b": F.col("b")}).first()
    assert r["q"] is None  # no discordance anywhere


def test_cochran_q_k2_equals_uncorrected_mcnemar(spark):
    from fireball_data_processing_spark.operators.hyptest import cochran_q
    import pyspark.sql.functions as F

    # b_disc=6, c_disc=2 -> uncorrected McNemar = (6-2)^2/8 = 2.0
    rows = (
        [(True, True)] * 3 + [(True, False)] * 6
        + [(False, True)] * 2 + [(False, False)] * 1
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cochran_q(df, {"a": F.col("a"), "b": F.col("b")}).first()
    assert r["q"] == 2.0


def test_kruskal_two_groups_equals_mannwhitney_z_squared(spark):
    # with exactly two groups, the tie-corrected H equals z^2 from the
    # tie-corrected Mann-Whitney normal approximation — a cross-check
    # of both rank machineries against each other
    from fireball_data_processing_spark.operators.hyptest import (
        kruskal_wallis,
        mann_whitney_u,
    )

    a = [1.0, 3.0, 3.0, 5.0, 9.0, 2.0]
    b = [2.0, 4.0, 4.0, 8.0, 8.0]
    df = spark.createDataFrame(
        [(v, "a") for v in a] + [(v, "b") for v in b], "v double, g string"
    )
    kw = kruskal_wallis(df, "v", "g").first()
    mw = mann_whitney_u(df, "v", F.col("g") == "b").first()
    assert abs(kw["h_adj"] - mw["z"] ** 2) < 1e-4


def test_spearman_null_metric_complete_case(spark):
    # review repro: one NULL in metric b must shrink n and re-rank over
    # the complete rows (listwise deletion == pandas dropna().corr),
    # not silently mix a full count with null-dropped sums
    from fireball_data_processing_spark.operators.hyptest import (
        spearman_matrix,
    )

    rows = [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, None),
            (4, 4.0, 4.0), (5, 5.0, 5.0)]
    df = spark.createDataFrame(rows, "id bigint, ma double, mb double")
    r = spearman_matrix(
        df, "id", {"ma": F.col("ma"), "mb": F.col("mb")}
    ).first()
    assert r["n"] == 4
    assert r["rho"] == 1.0  # ranks over complete rows: still monotone
    import pandas as pd

    want = (
        pd.DataFrame(rows, columns=["id", "ma", "mb"])[["ma", "mb"]]
        .dropna()
        .corr(method="spearman")
        .loc["ma", "mb"]
    )
    assert abs(r["rho"] - round(want, 6)) < 1e-6


def test_kruskal_null_values_omitted(spark):
    # NULL values are omitted (engines disagree on NULL rank order and
    # the old join dropped them from n but not from the rank shift)
    from fireball_data_processing_spark.operators.hyptest import (
        kruskal_wallis,
    )

    clean = [(1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")]
    dirty = clean + [(None, "b"), (None, "a")]
    d1 = spark.createDataFrame(clean, "v double, g string")
    d2 = spark.createDataFrame(dirty, "v double, g string")
    r1 = kruskal_wallis(d1, "v", "g").first()
    r2 = kruskal_wallis(d2, "v", "g").first()
    assert r1 == r2
    assert r2["n"] == 4
