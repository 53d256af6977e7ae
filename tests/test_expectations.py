"""Data-quality expectation operators: failure semantics on hand-built
frames — the synthetic tables all pass, so these pin what a VIOLATION
looks like (NULLs fail conservatively everywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from fireball_data_processing_spark.operators.expectations import (
    expect_condition,
    expect_references,
    expect_unique,
    expectation_suite,
)

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("val", LongType()),
        StructField("tag", StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_expect_condition_nulls_fail(spark):
    rows = [(1, 5, "a"), (2, None, "a"), (3, -1, "b"), (4, 10, None)]
    out = expect_condition(
        _df(spark, rows), "t", "val_in_0_10", F.col("val").between(0, 10)
    ).collect()[0]
    # -1 violates, NULL val fails conservatively; 5 and 10 pass
    assert (out["n_checked"], out["n_failed"]) == (4, 2)


def test_expect_unique_counts_dups_and_null_keys(spark):
    rows = [(1, 0, "a"), (1, 0, "b"), (1, 0, "c"), (2, 0, "d"), (None, 0, "e")]
    out = expect_unique(_df(spark, rows), "t", "unique_id", ["id"]).collect()[0]
    # 5 rows, 2 distinct non-null keys -> 3 failures (two extra 1s + the null)
    assert (out["n_checked"], out["n_failed"]) == (5, 3)


def test_expect_references_orphans_and_null_keys(spark):
    child = _df(spark, [(1, 0, "a"), (2, 0, "b"), (9, 0, "c"), (None, 0, "d")])
    parent = _df(spark, [(1, 0, "p"), (2, 0, "p"), (2, 0, "p2")])
    out = expect_references(
        child, "child", "fk_id", "id", parent, "id"
    ).collect()[0]
    # 9 is an orphan, NULL references nothing; duplicate parents don't
    # multiply child rows (join is against the DISTINCT key set)
    assert (out["n_checked"], out["n_failed"]) == (4, 2)


def test_expectation_suite_ledger(spark):
    good = _df(spark, [(1, 1, "a"), (2, 2, "b")])
    bad = _df(spark, [(1, -1, "a"), (1, 2, "b")])
    out = expectation_suite(
        [
            expect_unique(good, "g", "unique_id", ["id"]),
            expect_unique(bad, "b", "unique_id", ["id"]),
            expect_condition(bad, "b", "val_pos", F.col("val") > 0),
        ]
    ).collect()
    assert [(r["table_name"], r["expectation"]) for r in out] == [
        ("b", "unique_id"),
        ("b", "val_pos"),
        ("g", "unique_id"),
    ]
    by = {(r["table_name"], r["expectation"]): r for r in out}
    assert by[("g", "unique_id")]["passed"] is True
    assert by[("g", "unique_id")]["fail_rate"] == 0.0
    assert by[("b", "unique_id")]["passed"] is False
    assert by[("b", "unique_id")]["fail_rate"] == 0.5
    assert by[("b", "val_pos")]["n_failed"] == 1


def test_empty_batch_passes_cleanly(spark):
    # An empty intake batch must report passed=true / fail_rate=0.0,
    # not NULLs a gate filter would silently drop.
    empty = _df(spark, [])
    out = expectation_suite(
        [
            expect_condition(empty, "t", "val_pos", F.col("val") > 0),
            expect_unique(empty, "t", "unique_id", ["id"]),
        ]
    ).collect()
    assert len(out) == 2
    for r in out:
        assert (r["n_checked"], r["n_failed"]) == (0, 0)
        assert r["passed"] is True and r["fail_rate"] == 0.0
