"""Vocab richness (operators/profile.py), SNIPS off-policy value
(operators/ope.py), Neyman allocation (operators/sampling.py):
hand-computed cases and invariants."""

from __future__ import annotations

from fireball_data_processing_spark.operators.ope import (
    empirical_propensities,
    snips_value,
)
from fireball_data_processing_spark.operators.profile import vocab_richness
from fireball_data_processing_spark.operators.sampling import neyman_allocation


def _toks(spark, s):
    return spark.createDataFrame([(t,) for t in s.split()], "t string")


def test_vocab_richness_hand_computed(spark):
    r = vocab_richness(_toks(spark, "a a b"), "t").first()
    assert (r["n_tokens"], r["v_observed"], r["f1"], r["f2"]) == (3, 2, 1, 1)
    # chao1 = 2 + 1*0/(2*2) = 2.0 (bias-corrected form)
    assert r["chao1"] == 2.0
    assert abs(r["good_coverage"] - (1 - 1 / 3)) < 1e-6
    assert r["gt_singleton_rate"] == 2.0


def test_vocab_richness_no_singletons(spark):
    r = vocab_richness(_toks(spark, "a a b b"), "t").first()
    assert r["f1"] == 0
    assert r["good_coverage"] == 1.0
    assert r["gt_singleton_rate"] is None
    # no unseen mass signal: chao1 == v_observed
    assert r["chao1"] == 2.0


def test_vocab_richness_partitioning_invariance(spark):
    rows = [(f"t{(i * 13) % 37}",) for i in range(500)]
    a = vocab_richness(
        spark.createDataFrame(rows, "t string").repartition(1), "t"
    ).first()
    b = vocab_richness(
        spark.createDataFrame(rows, "t string").repartition(32), "t"
    ).first()
    assert a == b


def _log_df(spark, rows):
    return spark.createDataFrame(rows, "context bigint, action string, r double")


def test_propensities_are_conditional_frequencies(spark):
    df = _log_df(
        spark, [(0, "a", 1.0), (0, "a", 1.0), (0, "b", 0.0), (1, "b", 1.0)]
    )
    got = {
        (r["context"], r["action"]): r["pi_logged"]
        for r in empirical_propensities(df, "context", "action").collect()
    }
    assert abs(got[(0, "a")] - 2 / 3) < 1e-7
    assert abs(got[(0, "b")] - 1 / 3) < 1e-7
    assert got[(1, "b")] == 1.0


def test_snips_uniform_log_equals_logged_value(spark):
    # log serves both actions equally; uniform target -> w = 1 for all
    df = _log_df(
        spark, [(0, "a", 2.0), (0, "b", 4.0), (0, "a", 2.0), (0, "b", 4.0)]
    )
    r = snips_value(
        df, "context", "action", "r", target_probs={"a": 0.5, "b": 0.5}
    ).first()
    assert r["logged_value"] == 3.0
    assert r["ips_value"] == 3.0
    assert r["snips_value"] == 3.0
    assert r["ess"] == 4.0


def test_snips_hand_computed_skewed_log(spark):
    # a logged 3/4 (r=1), b logged 1/4 (r=0); uniform target:
    # w_a = .5/.75 = 2/3, w_b = .5/.25 = 2
    # ips = (3*(2/3) + 0)/4 = .5 ; snips = 2/(3*2/3 + 2) = .5
    # ess = (sum w)^2 / sum w^2 = 16 / (3*4/9 + 4) = 3.0
    df = _log_df(
        spark,
        [(0, "a", 1.0), (0, "a", 1.0), (0, "a", 1.0), (0, "b", 0.0)],
    )
    r = snips_value(
        df, "context", "action", "r", target_probs={"a": 0.5, "b": 0.5}
    ).first()
    assert r["ips_value"] == 0.5
    assert r["snips_value"] == 0.5
    assert abs(r["ess"] - 3.0) < 1e-6
    assert r["n_actions"] == 2


def test_snips_default_uniform_target(spark):
    df = _log_df(spark, [(0, "a", 1.0), (0, "b", 3.0)])
    r = snips_value(df, "context", "action", "r").first()
    assert r["snips_value"] == 2.0


def test_neyman_zero_variance_stratum_gets_no_budget(spark):
    rows = [("flat", 5.0)] * 50 + [("wild", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 40).collect()}
    assert got["flat"]["sigma"] == 0.0
    assert got["flat"]["n_target"] == 0
    assert got["wild"]["n_target"] == 40
    assert abs(got["flat"]["share"] + got["wild"]["share"] - 1.0) < 1e-7


def test_neyman_target_capped_at_population(spark):
    rows = [("tiny", float(i)) for i in range(3)] + [("big", 1.0)] * 100
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 50).collect()}
    # all the variance is in 'tiny' -> it would get the whole budget,
    # but n_target is capped at its population of 3
    assert got["tiny"]["n_target"] == 3
    assert got["tiny"]["rate"] == 1.0
    assert got["big"]["n_target"] == 0


def test_lorenz_equal_values_gini_zero(spark):
    from fireball_data_processing_spark.operators.profile import lorenz_gini

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(100)], "k bigint, v double"
    )
    out = lorenz_gini(df, "v", "k", n_buckets=10).collect()
    assert len(out) == 10
    assert all(r["gini"] == 0.0 for r in out)
    # Lorenz curve is the diagonal: each decile holds 10% of mass
    assert all(abs(r["value_share"] - 0.1) < 1e-6 for r in out)
    assert abs(out[-1]["cum_value_share"] - 1.0) < 1e-6


def test_lorenz_concentrated_mass_high_gini(spark):
    from fireball_data_processing_spark.operators.profile import lorenz_gini

    rows = [(i, 0.0001) for i in range(99)] + [(99, 1000.0)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    out = lorenz_gini(df, "v", "k", n_buckets=10).collect()
    assert out[0]["gini"] > 0.97
    # the top decile holds essentially all mass
    assert out[-1]["value_share"] > 0.999


def test_lorenz_hand_computed_two_values(spark):
    from fireball_data_processing_spark.operators.profile import lorenz_gini

    # values 1, 3: sorted x = (1, 3); G = 2*(1*1+2*3)/(2*4) - 3/2 = 0.25
    df = spark.createDataFrame([(0, 1.0), (1, 3.0)], "k bigint, v double")
    out = lorenz_gini(df, "v", "k", n_buckets=2).collect()
    assert out[0]["gini"] == 0.25
    assert out[0]["cum_value_share"] == 0.25
