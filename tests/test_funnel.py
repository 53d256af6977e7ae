"""Funnel / cohort-retention operators (operators/funnel.py):
hand-computed sequences, ordering enforcement, single-exchange plan pin."""

from __future__ import annotations

import io
import contextlib

from fireball_data_processing_spark.operators.funnel import (
    WEEK_NS,
    cohort_retention,
    funnel_steps,
)

DAY_NS = 86400 * 1_000_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts bigint"
    )


def test_funnel_requires_step_order(spark):
    # u1 completes all three in order; u2 clicked BEFORE viewing (the
    # click must not count); u3 only views
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "click", 5), (2, "view", 10), (2, "purchase", 30),
        (3, "view", 10),
    ]
    got = {
        r["step"]: (r["n_users"], r["conv_from_prev"], r["conv_from_start"])
        for r in funnel_steps(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    # u2's purchase can't count either: no valid click ever happened
    assert got[1] == (3, None, 1.0)
    assert got[2] == (1, round(1 / 3, 6), round(1 / 3, 6))
    assert got[3] == (1, 1.0, round(1 / 3, 6))


def test_funnel_simultaneous_events_count(spark):
    rows = [(1, "view", 10), (1, "click", 10), (1, "purchase", 10)]
    got = {r["step"]: r["n_users"] for r in funnel_steps(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_funnel_single_exchange_plan(spark):
    # the conditional-min chain must share ONE user-hash exchange
    df = funnel_steps(
        _ev(spark, [(1, "view", 10)]), ["view", "click", "purchase"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 1, plan


def test_cohort_retention_hand_computed(spark):
    # u1 first in week 0, active weeks 0 and 2; u2 first week 0, only
    # week 0; u3 first week 2, active weeks 2 and 3
    rows = [
        (1, "view", 0), (1, "view", 2 * WEEK_NS + DAY_NS),
        (2, "view", DAY_NS),
        (3, "view", 2 * WEEK_NS), (3, "view", 3 * WEEK_NS),
    ]
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 2): (1, 2, 0.5),
        (2, 0): (1, 1, 1.0),
        (2, 1): (1, 1, 1.0),
    }
