"""Typed event schemas.

Two schemas live here:

1. ``EVENT_SCHEMA`` — the flattened union of the reference's 8 event types
   (TypeScript spec at reference ``explorer/src/avrae/events.ts:8-77``;
   FIXTURES.md section 1). Columns absent for a type are null. The
   recursive ``automation`` / ``automation_result`` payloads stay JSON
   strings (Spark's type system cannot express unbounded recursion; parsing
   on demand via ``from_json``/``get_json_object`` also means untouched
   queries never pay to decode them — the reference reparses whole events
   every time, ``explorer_server.py:85``).

2. ``StreamSchema`` — a small adapter describing any "event stream" table
   (instance key, order, event-time, type column, and which type values play
   the *message* / *command* roles). The heuristic and sessionization
   operators are written against the adapter, so the same code runs on real
   FIREBALL events and on the driver's synthetic ``events`` table.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T

# Avrae's bot author id (reference heuristics/utils.py:5).
AVRAE_ID = "261302296103747584"

_EFFECT = T.StructType([T.StructField("name", T.StringType())])
_ATTACK = T.StructType([T.StructField("name", T.StringType())])
_SPELLBOOK = T.StructType(
    [
        T.StructField(
            "spells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("prepared", T.BooleanType()),
                    ]
                )
            ),
        )
    ]
)

# One explicit nesting level for type == 'group' combatants
# (reference heuristics/zhu.py:53-59).
_INNER_COMBATANT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("controller_id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

COMBATANT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("controller_id", T.LongType()),
        T.StructField("init", T.IntegerType()),
        T.StructField("private", T.BooleanType()),
        T.StructField("index", T.IntegerType()),
        T.StructField("type", T.StringType()),  # common|player|monster|group
        T.StructField("id", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("effects", T.ArrayType(_EFFECT)),
        T.StructField("group_id", T.StringType()),
        T.StructField("ac", T.IntegerType()),
        T.StructField("max_hp", T.IntegerType()),
        T.StructField("hp", T.IntegerType()),
        T.StructField("temp_hp", T.IntegerType()),
        T.StructField("stats", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("levels", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("skills", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField(
            "resistances", T.MapType(T.StringType(), T.ArrayType(T.StringType()))
        ),
        T.StructField("saves", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("attacks", T.ArrayType(_ATTACK)),
        T.StructField("spellbook", _SPELLBOOK),
        T.StructField("creature_type", T.StringType()),
        T.StructField("monster_name", T.StringType()),
        T.StructField("monster_id", T.LongType()),
        # caster-id coalesce inputs (reference distill2_authors.py:47-52).
        T.StructField("owner_id", T.StringType()),
        T.StructField("character_id", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("upstream", T.StringType()),
        T.StructField("combatants", T.ArrayType(_INNER_COMBATANT)),
    ]
)

COMBAT_STATE = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("summary", T.LongType()),
        T.StructField("dm", T.LongType()),
        T.StructField("options", T.MapType(T.StringType(), T.StringType())),
        T.StructField("combatants", T.ArrayType(COMBATANT)),
        T.StructField("turn", T.IntegerType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("current", T.IntegerType()),  # nullable index
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

_EMBED_FIELD = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("inline", T.BooleanType()),
    ]
)
EMBED = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("fields", T.ArrayType(_EMBED_FIELD)),
        T.StructField("color", T.IntegerType()),
    ]
)

# Flattened union of the 8 event types (FIXTURES.md section 1).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("combat_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.DoubleType()),  # float epoch seconds
        # message / command (int64 snowflakes: LongType, no BigNumber hack)
        T.StructField("message_id", T.LongType()),
        T.StructField("author_id", T.StringType()),
        T.StructField("author_name", T.StringType()),
        T.StructField("author_bot", T.BooleanType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("embeds", T.ArrayType(EMBED)),
        T.StructField("components", T.ArrayType(T.StringType())),
        T.StructField("referenced_message_id", T.LongType()),
        # command extras
        T.StructField("prefix", T.StringType()),
        T.StructField("command_name", T.StringType()),
        T.StructField("called_by_alias", T.BooleanType()),
        T.StructField("caster", T.StringType()),  # JSON string, parse on demand
        T.StructField("targets", T.StringType()),  # JSON string (mixed types)
        # alias / snippet resolution
        T.StructField("alias_name", T.StringType()),
        T.StructField("alias_body", T.StringType()),
        T.StructField("content_before", T.StringType()),
        T.StructField("content_after", T.StringType()),
        T.StructField("snippet_name", T.StringType()),
        T.StructField("snippet_body", T.StringType()),
        # button_press
        T.StructField("interaction_id", T.LongType()),
        T.StructField("interaction_message_id", T.LongType()),
        T.StructField("button_id", T.StringType()),
        T.StructField("button_label", T.StringType()),
        # automation_run
        T.StructField("automation", T.StringType()),  # opaque JSON
        T.StructField("automation_result", T.StringType()),  # recursive JSON
        # combat_state_update
        T.StructField("probable_interaction_id", T.LongType()),
        T.StructField("data", COMBAT_STATE),
        T.StructField("human_readable", T.StringType()),
    ]
)


@dataclass(frozen=True)
class StreamSchema:
    """Adapter from any event-stream table to the operator library.

    ``message_types`` / ``command_types`` say which ``type_col`` values play
    the reference's *message* / *command* roles (every heuristic is defined
    in terms of those two roles).
    """

    instance_col: str = "combat_id"
    seq_col: str = "seq"
    ts_col: str = "timestamp"
    type_col: str = "event_type"
    message_types: tuple[str, ...] = ("message",)
    command_types: tuple[str, ...] = ("command",)
    author_col: str = "author_id"
    # numeric payload used for "message length"-style measures; the real
    # schema derives it from content, the synthetic table has `value`.
    measure_col: str | None = None
    # how event time is encoded: the FIREBALL stream keeps raw float epoch
    # seconds ("double_seconds"); the synthetic table is TIMESTAMP(NANOS)
    # parquet read as int64 nanoseconds ("nanos_long").
    ts_unit: str = "double_seconds"
    # optional refinement of the *utterance* role (the reference's word-count
    # heuristics use non-bot, non-command-invocation messages —
    # heuristics/ratio.py:15-25): a zero-arg factory returning a Column
    # predicate ANDed with the message-role test. None = every message.
    extra_utterance_predicate: Callable[[], Any] | None = None


# The real FIREBALL event stream.
FIREBALL_STREAM = StreamSchema()

# The driver's synthetic `events` table (TESTDATA.md): user_id plays the
# instance key, event_id the canonical order, `view` the message role and
# `purchase` the command role; `value` is the per-event measure.
SYNTHETIC_STREAM = StreamSchema(
    instance_col="user_id",
    seq_col="event_id",
    ts_col="ts",
    type_col="event_type",
    message_types=("view",),
    command_types=("purchase",),
    author_col="user_id",
    measure_col="value",
    ts_unit="nanos_long",
)
