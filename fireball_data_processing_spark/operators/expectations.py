"""Declarative data-quality expectations — the Deequ/Great-Expectations
idiom (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018) as plain DataFrame aggregates: each
expectation reduces a table to ONE row (n_checked, n_failed), and a
suite is the union of those rows — the contract a training-data
pipeline asserts over every intake batch before anything downstream
trusts it.

Relation to the rest of the catalog: ``table_profile`` DESCRIBES a
table (nulls/cardinality/ranges); an expectation suite ASSERTS on it
and yields a pass/fail ledger a scheduler can gate on. The reference
validates per-row shape inline while distilling (required-keys checks,
``distill1_time_group.py`` filters); this is the corpus-grain form.

Scale notes: every check is one scan + one aggregate (map-side partial
combine, constant-size output); the referential-integrity check is one
equi-join against the DISTINCT parent key set — at warehouse scale
that distinct set is itself large, so the join is left as a plain
shuffle join for AQE to size (broadcast when the parent is small,
sort-merge otherwise). The suite unions one-row frames, so suite size
adds scheduler overhead only, never data movement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect_condition",
    "expect_unique",
    "expect_references",
    "expectation_suite",
]


def _one_row(
    df: DataFrame, table: str, name: str, failed: Column
) -> DataFrame:
    # count(when), not sum(when): on an EMPTY batch sum() is NULL, which
    # would make passed/fail_rate NULL — a gate that neither passes nor
    # fails. count() is 0 there, so an empty batch reports passed=true,
    # matching the SQL COUNT(CASE ...) convention the oracle uses.
    return df.agg(
        F.lit(table).alias("table_name"),
        F.lit(name).alias("expectation"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.count(F.when(failed, F.lit(1))).cast("bigint").alias("n_failed"),
    )


def expect_condition(
    df: DataFrame, table: str, name: str, ok: Column
) -> DataFrame:
    """Row-level predicate expectation: a row fails when ``ok`` is not
    TRUE (so NULL predicate results fail, the conservative reading).
    Covers not-null, non-empty, range, and set-membership checks."""
    return _one_row(df, table, name, ~ok.eqNullSafe(F.lit(True)))


def expect_unique(df: DataFrame, table: str, name: str, cols: list[str]) -> DataFrame:
    """Key-uniqueness expectation: n_failed counts every row beyond one
    per distinct non-null key tuple (rows with a NULL key component all
    fail — COUNT(DISTINCT) excludes them, same convention both
    engines). One aggregate, no join."""
    return df.agg(
        F.lit(table).alias("table_name"),
        F.lit(name).alias("expectation"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint")
        .alias("n_failed"),
    )


def expect_references(
    child: DataFrame,
    table: str,
    name: str,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Referential-integrity expectation: a child row fails when its key
    has no match in the parent's distinct key set (NULL child keys
    fail — they reference nothing). Plain equi-join on the distinct
    parent keys; AQE sizes it (broadcast iff the parent key set is
    small)."""
    keys = parent.select(
        F.col(parent_col).alias("__pk"), F.lit(True).alias("__hit")
    ).distinct()
    joined = child.join(keys, child[child_col] == keys["__pk"], "left")
    return _one_row(joined, table, name, F.col("__hit").isNull())


def expectation_suite(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row expectation frames into the suite ledger, with
    pass flags and failure rates, ordered for stable reporting."""
    suite = reduce(DataFrame.unionByName, checks)
    return suite.select(
        "table_name",
        "expectation",
        "n_checked",
        "n_failed",
        (F.col("n_failed") == 0).alias("passed"),
        F.round(
            F.col("n_failed").cast("double")
            / F.greatest(F.col("n_checked"), F.lit(1)).cast("double"),
            6,
        ).alias("fail_rate"),
    ).orderBy("table_name", "expectation")
