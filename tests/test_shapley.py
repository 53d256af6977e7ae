"""Shapley channel attribution (operators/shapley.py): coalition
weights, efficiency axiom, symmetry, dummy player."""

from __future__ import annotations

from math import factorial

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.shapley import (
    coalition_table,
    shapley_attribution,
)


def test_coalition_weights_sum_to_one_per_player(spark):
    for k in (2, 3, 4):
        rows = coalition_table(k)
        for i in range(k):
            w = sum(r[3] for r in rows if r[0] == i)
            assert abs(w - 1.0) < 1e-9
        assert len(rows) == k * 2 ** (k - 1)


def _touches(spark, users):
    # users: dict user -> (channels list, converted)
    rows = []
    for u, (chans, conv) in users.items():
        for c in chans:
            rows.append((u, c, conv))
    return spark.createDataFrame(rows, "u bigint, ch string, conv boolean")


def test_hand_computed_game_with_missing_coalitions(spark):
    # conversion happens iff 'a' was touched; the {a,b} and {} masks
    # have NO users, so the empirical game sets v = 0 there (documented
    # convention): v({a})=1, v({b})=0, v({a,b})=v({})=0
    users = {
        1: (["a"], True), 2: (["a"], True),
        3: (["b"], False), 4: (["b"], False),
    }
    df = _touches(spark, users)
    out = {
        r["channel"]: r["shapley_credit"]
        for r in shapley_attribution(
            df, "u", "ch", F.col("conv"), channels=["a", "b"]
        ).collect()
    }
    # phi_a = .5*(v(a)-v({})) + .5*(v(ab)-v(b)) = .5*1 + .5*0 = .5
    # phi_b = .5*(v(b)-v({})) + .5*(v(ab)-v(a)) = 0 + .5*(-1) = -.5
    # efficiency: phi_a + phi_b = v(grand) - v(empty) = 0  (both unseen)
    assert abs(out["a"] - 0.5) < 1e-6
    assert abs(out["b"] - (-0.5)) < 1e-6


def test_symmetric_channels_share_equally(spark):
    users = {
        1: (["a", "b"], True), 2: (["a", "b"], True),
        3: (["a", "b"], False),
    }
    df = _touches(spark, users)
    out = {
        r["channel"]: r
        for r in shapley_attribution(
            df, "u", "ch", F.col("conv"), channels=["a", "b"]
        ).collect()
    }
    assert out["a"]["shapley_credit"] == out["b"]["shapley_credit"]
    assert out["a"]["touched_users"] == 3


def test_efficiency_credits_sum_to_grand_minus_empty(spark):
    users = {
        1: (["a"], True), 2: (["b"], True), 3: (["a", "b"], True),
        4: (["a"], False), 5: (["b"], False), 6: ([], False),
    }
    # user 6 with no touches: feed a non-channel row so the empty mask
    # exists (the query feeds purchase rows the same way)
    users[6] = (["zz"], False)
    df = _touches(spark, users)
    out = shapley_attribution(
        df, "u", "ch", F.col("conv"), channels=["a", "b"]
    ).collect()
    total = sum(r["shapley_credit"] for r in out)
    # v(grand)=v({a,b})=1 (user 3), v(empty)=0 (user 6) -> sum = 1
    assert abs(total - 1.0) < 1e-6
