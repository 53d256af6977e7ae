"""Parquet table loaders for the synthetic test corpus.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` (TESTDATA.md). One parquet file per table at
``{sf_dir}/{name}.parquet``.

At 100 TB each "table" would be a partitioned directory; ``load_table``
takes any path Spark's parquet reader accepts, so the same call works on a
single file or a 10k-file partitioned layout. Column pruning and predicate
pushdown then come from Catalyst for free — callers should select/filter
before any wide transformation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from the scale-factor directory.

    The ``events`` table carries TIMESTAMP(NANOS) parquet, which Spark 4
    rejects by default; we read it as int64 nanoseconds
    (``spark.sql.legacy.parquet.nanosAsLong``) — the engine's stream
    operators treat event time as an exact integer, which is also what
    keeps timestamp arithmetic bit-identical with the DuckDB oracle
    (DuckDB truncates the same column to whole microseconds).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table; keys match DuckDB's pre-registered views."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
