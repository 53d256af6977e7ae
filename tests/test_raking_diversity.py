"""IPF raking (operators/raking.py) and Hill-number diversity:
margin-matching, fixed-point, and hand-computed diversity values."""

from __future__ import annotations

from fireball_data_processing_spark.operators.raking import raking_weights


def _cat_df(spark, rows):
    return spark.createDataFrame(rows, "r string, c string")


def _margins(out, axis):
    m = {}
    for row in out:
        key = row["row_cat"] if axis == 0 else row["col_cat"]
        m[key] = m.get(key, 0.0) + row["weighted_share"]
    return m


def test_raking_matches_both_margins(spark):
    rows = (
        [("a", "x")] * 40 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 40
    )
    out = raking_weights(
        _cat_df(spark, rows), "r", "c",
        row_targets={"a": 0.5, "b": 0.5},
        col_targets={"x": 0.7, "y": 0.3},
        n_iter=16,
    ).collect()
    rm = _margins(out, 0)
    cm = _margins(out, 1)
    assert abs(rm["a"] - 0.5) < 1e-4 and abs(rm["b"] - 0.5) < 1e-4
    assert abs(cm["x"] - 0.7) < 1e-4 and abs(cm["y"] - 0.3) < 1e-4


def test_raking_identity_when_already_on_target(spark):
    rows = [("a", "x")] * 30 + [("a", "y")] * 20 + [("b", "x")] * 30 + [("b", "y")] * 20
    out = raking_weights(
        _cat_df(spark, rows), "r", "c",
        row_targets={"a": 0.5, "b": 0.5},
        col_targets={"x": 0.6, "y": 0.4},
        n_iter=8,
    ).collect()
    assert all(abs(r["weight"] - 1.0) < 1e-6 for r in out)


def test_raking_weighted_shares_sum_to_one(spark):
    rows = [("a", "x")] * 5 + [("b", "y")] * 3 + [("b", "x")] * 2
    out = raking_weights(
        _cat_df(spark, rows), "r", "c",
        row_targets={"a": 0.3, "b": 0.7},
        col_targets={"x": 0.5, "y": 0.5},
        n_iter=12,
    ).collect()
    assert abs(sum(r["weighted_share"] for r in out) - 1.0) < 1e-5


def test_hill_numbers_uniform_and_dominated(spark):
    from pyspark.sql import functions as F

    # uniform over 4 types: hill1 = hill2 = 4, evenness = 1
    rows = [("u", f"t{i % 4}") for i in range(40)]
    # dominated: one type holds 37/40 of the mass
    rows += [("d", "z" if i else f"q{i}") for i in range(40) for _ in [0]][:0]
    rows += [("d", "z")] * 37 + [("d", "q1"), ("d", "q2"), ("d", "q3")]
    df = spark.createDataFrame(rows, "lang string, t string")
    c = df.groupBy("lang", "t").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = c.groupBy("lang").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    s = (
        c.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("rich"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("h"),
            F.round(F.sum(p * p), 8).alias("simp"),
        )
        .collect()
    )
    by = {r["lang"]: r for r in s}
    assert abs(2 ** by["u"]["h"] - 4.0) < 1e-4
    assert abs(1.0 / by["u"]["simp"] - 4.0) < 1e-4
    # dominated corpus: effective diversity collapses toward 1 despite
    # richness 4
    assert by["d"]["rich"] == 4
    assert 1.0 < 1.0 / by["d"]["simp"] < 1.3


def test_raking_zero_target_margin_is_guarded(spark):
    # ADVICE r8: a 0.0 target share zeroed its category's weights on
    # pass 1 and then divided 0/0 on pass 2. Now: the dead category's
    # weights pin to 0, every other margin still converges, no error.
    rows = [("a", "x")] * 40 + [("b", "x")] * 40 + [("b", "y")] * 20
    out = raking_weights(
        _cat_df(spark, rows), "r", "c",
        row_targets={"a": 0.0, "b": 1.0},
        col_targets={"x": 0.6, "y": 0.4},
        n_iter=8,
    ).collect()
    dead = [r for r in out if r["row_cat"] == "a"]
    assert dead and all(r["weight"] == 0.0 for r in dead)
    live = {}
    for r in out:
        if r["row_cat"] == "b":
            live[r["col_cat"]] = live.get(r["col_cat"], 0.0) + r["weighted_share"]
    assert abs(live["x"] - 0.6) < 1e-4 and abs(live["y"] - 0.4) < 1e-4


def test_raking_all_zero_targets_yield_zero_shares(spark):
    # degenerate: every present category targeted at 0 -> all weights 0,
    # shares reported as 0 instead of a ZeroDivisionError
    rows = [("a", "x")] * 3 + [("b", "y")] * 2
    out = raking_weights(
        _cat_df(spark, rows), "r", "c",
        row_targets={"a": 0.0, "b": 0.0},
        col_targets={},
        n_iter=4,
    ).collect()
    assert all(r["weight"] == 0.0 and r["weighted_share"] == 0.0 for r in out)
