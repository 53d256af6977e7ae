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


# =====================================================================
# Sessionization / as-of / nearest / runs / correlation (section 2.3, 2.5)
# =====================================================================

# the synthetic stream's micro-second event time, shared by oracles below
_TS_US = "epoch_us(ts)"


@query(
    "asof_state_backward",
    f"""
SELECT event_id, user_id,
  LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id
FROM events
""",
)
def q_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 combat_state_at_event: last 'signup' at-or-before each event
    (reference heuristics/utils.py:153-160)."""
    from fireball_data_processing_spark.operators.asof import asof_backward_col

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        asof_backward_col(
            F.col("event_type") == "signup", F.col("event_id"),
            ["user_id"], "event_id",
        ).alias("last_signup_id"),
    )


@query(
    "asof_state_forward",
    """
SELECT event_id, user_id,
  FIRST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_error_id
FROM events
""",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 combat_state_after_event: first 'error' at-or-after each event
    (reference heuristics/utils.py:162-169)."""
    from fireball_data_processing_spark.operators.asof import asof_forward_col

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        asof_forward_col(
            F.col("event_type") == "error", F.col("event_id"),
            ["user_id"], "event_id",
        ).alias("next_error_id"),
    )


@query(
    "nearest_purchase",
    f"""
WITH t AS (
  SELECT event_id, user_id, event_type, {_TS_US} AS ts_us,
    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      OVER w_b AS bwd_id,
    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN {_TS_US} END IGNORE NULLS)
      OVER w_b AS bwd_ts,
    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      OVER w_f AS fwd_id,
    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN {_TS_US} END IGNORE NULLS)
      OVER w_f AS fwd_ts
  FROM events
  WINDOW
    w_b AS (PARTITION BY user_id ORDER BY {_TS_US},
            CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_f AS (PARTITION BY user_id ORDER BY {_TS_US},
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
  CASE WHEN fwd_ts IS NULL
         OR (bwd_ts IS NOT NULL AND (ts_us - bwd_ts) <= (fwd_ts - ts_us))
       THEN bwd_id ELSE fwd_id END AS purchase_id_nearest,
  CASE WHEN fwd_ts IS NULL
         OR (bwd_ts IS NOT NULL AND (ts_us - bwd_ts) <= (fwd_ts - ts_us))
       THEN ts_us - bwd_ts ELSE fwd_ts - ts_us END AS nearest_delta
FROM t WHERE event_type = 'view'
""",
)
def q_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8/J3 nearest-in-time join: each view attaches to the purchase
    minimizing |ts delta|, ties to the earlier one (reference
    distill1_time_group.py:48-52 — merge_asof(direction='nearest'))."""
    from fireball_data_processing_spark.operators.asof import nearest_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
    )
    out = nearest_join(
        views, purchases, ["user_id"], "ts_us", "purchase_id", prefer="backward"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("purchase_id_nearest"),
        F.col("nearest_delta"),
    )


@query(
    "run_lengths",
    """
WITH flagged AS (
  SELECT user_id, event_id, event_type, value,
    CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
runs AS (
  SELECT user_id, event_id, event_type, value,
    SUM(chg) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
)
SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
  MIN(event_type) AS event_type,
  COUNT(*) AS run_len,
  ROUND(SUM(value), 6) AS run_value_sum
FROM runs
GROUP BY user_id, run_id
""",
)
def q_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 consecutive-run grouping (reference distill1_time_group.py:33-42):
    change-point flag -> running sum -> per-run aggregates."""
    from fireball_data_processing_spark.operators.runs import with_run_ids

    ev = load_table(spark, sf_dir, "events")
    runs = with_run_ids(ev, ["user_id"], "event_id", ["event_type"])
    return runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).alias("run_len"),
        F.round(F.sum("value"), 6).alias("run_value_sum"),
    )


@query(
    "correlation_groups",
    """
WITH keyed AS (
  SELECT user_id, event_id, event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
),
anchors AS (
  SELECT DISTINCT user_id, k FROM keyed WHERE event_type = 'view'
)
SELECT keyed.user_id AS user_id, keyed.k AS k, COUNT(*) AS n_events
FROM keyed SEMI JOIN anchors
  ON keyed.user_id = anchors.user_id AND keyed.k = anchors.k
GROUP BY keyed.user_id, keyed.k
""",
)
def q_correlation_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 message-group correlation (reference heuristics/utils.py:92-110):
    events keep only correlation keys anchored by a message-role event;
    left-semi join on (instance, correlation_id)."""
    from fireball_data_processing_spark.operators.correlate import (
        with_correlation_groups,
    )

    ev = load_table(spark, sf_dir, "events")
    corr = F.get_json_object(F.col("props"), "$.k").cast("int")
    grouped = with_correlation_groups(
        ev, ["user_id"], corr, F.col("event_type") == "view", corr_col="k"
    )
    return grouped.groupBy("user_id", "k").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "history_window_sums",
    """
SELECT event_id, user_id,
  COUNT(value) OVER w AS hist_count,
  ROUND(SUM(value) OVER w, 6) AS hist_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
""",
)
def q_history_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12 utterance-history window (reference distill4_normalize.py:383-399):
    rolling stats over the 5 rows strictly before each event."""
    from fireball_data_processing_spark.operators.windows import history_window

    ev = load_table(spark, sf_dir, "events")
    out = history_window(
        ev, ["user_id"], "event_id", F.col("value"), k=5, agg="count",
        out_col="hist_count",
    )
    out = history_window(
        out, ["user_id"], "event_id", F.col("value"), k=5, agg="sum",
        out_col="hist_sum",
    )
    return out.select(
        "event_id", "user_id", "hist_count", F.round("hist_sum", 6).alias("hist_sum")
    )


@query(
    "find_error_after_purchase",
    """
WITH t AS (
  SELECT event_id, user_id, event_type,
    FIRST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN 1 FOLLOWING AND 50 FOLLOWING) AS first_error_id
  FROM events
)
SELECT event_id, user_id, first_error_id
FROM t WHERE event_type = 'purchase'
""",
)
def q_find_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 bounded window search `find` (reference heuristics/utils.py:127-148):
    first matching event within the next 50 rows of each anchor."""
    from fireball_data_processing_spark.operators.windows import find_first_after

    ev = load_table(spark, sf_dir, "events")
    out = find_first_after(
        ev,
        ["user_id"],
        "event_id",
        anchor_predicate=F.col("event_type") == "purchase",
        match_predicate=F.col("event_type") == "error",
        value=F.col("event_id"),
        lookahead=50,
        out_col="first_error_id",
    )
    return out.select("event_id", "user_id", "first_error_id")


def get(name: str) -> QuerySpec:
    return REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
