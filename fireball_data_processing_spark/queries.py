"""Driver-contract query catalog.

Every implemented operator from SURVEY.md section 2 gets a named query here
plus (where SQL-expressible) a DuckDB oracle string. ``__spark_entry__.py``
re-exports this registry.

Conventions that make the driver's hash compare deterministic:

- every computed column is aliased identically in Spark and SQL;
- double-valued aggregates are rounded (6 dp for ratios/averages, 2 dp for
  large money sums) on BOTH sides — cross-engine float summation order is
  not reproducible bit-for-bit, rounding is;
- DuckDB ``SUM`` over integers returns HUGEINT; oracles cast to BIGINT to
  match Spark's LongType;
- timestamp deltas are computed on int64 microseconds and divided once.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fireball_data_processing_spark.schema import SYNTHETIC_STREAM
from fireball_data_processing_spark.sources.tables import load_table
from fireball_data_processing_spark.plans.heuristics import heuristics_matrix, HEURISTICS

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None => rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def _r6(c):  # ratio/average rounding
    return F.round(c, 6)


# =====================================================================
# Heuristics engine (SURVEY section 2.4, A1-A15) — one grouped aggregation
# =====================================================================

_HEURISTIC_ORACLE = """
WITH feat AS (
  SELECT
    user_id, event_id, event_type, value,
    epoch_us(ts) AS ts_us,
    MAX(CASE WHEN event_type = 'purchase' THEN event_id END)
      OVER (PARTITION BY user_id) AS last_cmd_seq,
    LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_msg_ts_us,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS had_prior_msg,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
)
SELECT
  user_id,
  COUNT(*) AS event_count,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS message_count,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS command_count,
  ROUND(CASE WHEN COUNT(CASE WHEN event_type = 'view' THEN 1 END) > 0
        THEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)::DOUBLE
           / COUNT(CASE WHEN event_type = 'view' THEN 1 END)::DOUBLE END,
        6) AS message_to_command_ratio,
  ROUND(COALESCE(AVG(CASE WHEN event_type = 'view' THEN value END), 0.0), 6)
        AS average_message_length,
  COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS num_participants,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS num_turns,
  ROUND(COALESCE(SUM(CASE WHEN event_type = 'view' THEN value END), 0.0)
        / (COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) + 1)::DOUBLE,
        6) AS avg_words_between_commands,
  ROUND(CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        THEN COALESCE(SUM(CASE WHEN event_type = 'view' AND event_id < last_cmd_seq
                           THEN value END), 0.0)
           / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)::DOUBLE END,
        6) AS avg_words_between_commands_excl_last,
  ROUND(AVG(CASE WHEN event_type = 'purchase' AND prev_msg_ts_us IS NOT NULL
        THEN (ts_us - prev_msg_ts_us)::DOUBLE / 1000000.0 END), 6)
        AS avg_time_between_message_and_command,
  ROUND(COALESCE(AVG(CASE WHEN event_type = 'purchase'
        THEN CASE WHEN COALESCE(had_prior_msg, 0) = 0 THEN 1.0 ELSE 0.0 END END),
        0.0), 6) AS ratio_of_commands_without_message,
  COUNT(CASE WHEN prev_type IS NOT NULL AND prev_type <> event_type THEN 1 END)
        AS num_turn_changes
FROM feat
GROUP BY user_id
"""

_ROUND6_HEURISTICS = (
    "message_to_command_ratio",
    "average_message_length",
    "avg_words_between_commands",
    "avg_words_between_commands_excl_last",
    "avg_time_between_message_and_command",
    "ratio_of_commands_without_message",
)


@query("heuristics_matrix", _HEURISTIC_ORACLE)
def q_heuristics_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-instance heuristic suite in ONE scan + ONE shuffle
    (reference runs one full corpus scan per heuristic,
    heuristic_worker.py:129-131)."""
    events = load_table(spark, sf_dir, "events")
    out = heuristics_matrix(events, SYNTHETIC_STREAM, HEURISTICS)
    for c in _ROUND6_HEURISTICS:
        out = out.withColumn(c, _r6(F.col(c)))
    return out


def get(name: str) -> QuerySpec:
    return REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
