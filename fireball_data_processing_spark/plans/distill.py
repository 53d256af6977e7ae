"""The distillation pipeline (SURVEY.md section 3.2) as composable
DataFrame transformations.

The reference runs five filesystem-coupled stages, each a process pool over
instance files, and stages 2/4 re-read the raw corpus (``distill2_authors.py:
96-98``, ``distill4_normalize.py:496-498``). Here each stage is a pure
``DataFrame -> DataFrame`` function over ONE shared scan; the pipeline is a
single DAG with no intermediate filesystem hops (checkpoint with
``df.write.parquet`` wherever debuggability wants it).

Stage 1 (``distill1_time_group.py``): anchor events (automation runs /
commands) collect nearby utterances — each utterance attaches to the
*nearest* anchor in event time (G8) and lands in its ``before`` or ``after``
side (G9); anchors with no utterances still form triples (G10/G11 drops
empty instances only at write time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.asof import nearest_join
from fireball_data_processing_spark.schema import StreamSchema


def assemble_triples(
    events: DataFrame,
    s: StreamSchema,
    utterance_predicate: Column,
    anchor_predicate: Column,
    payload_col: str,
    order_expr: Column | None = None,
) -> DataFrame:
    """distill1: one row per anchor with its before/after utterance stats
    and ordered payload lists.

    Output: (instance, anchor_id, n_before, n_after, before_payloads,
    after_payloads). Plan: nearest-join utterances to anchors (union +
    window, one shuffle on the instance key), tag the side by time order,
    then one grouped aggregation with order-preserving ``sort_array``
    collection (the reference's list-index ordering made explicit).
    """
    inst = s.instance_col
    order_col = "__ord"
    ev = events.withColumn(order_col, order_expr if order_expr is not None else F.col(s.seq_col))

    utts = ev.filter(utterance_predicate).select(
        F.col(inst), F.col(order_col), F.col(payload_col).alias("__payload")
    )
    anchors = ev.filter(anchor_predicate).select(
        F.col(inst),
        F.col(order_col),
        F.col(s.seq_col).alias("anchor_id"),
    )

    assigned = (
        nearest_join(utts, anchors, [inst], order_col, "anchor_id",
                     prefer="backward")
        .withColumnRenamed("anchor_id_nearest", "anchor_id")
        .withColumnRenamed("nearest_ord", "__a_ord")
        .drop("nearest_delta")
        .filter(F.col("anchor_id").isNotNull())
    )
    # before/after tagging (G9): an utterance later than its anchor is
    # 'after'. The anchor's order value came through the nearest join, so
    # no join back to the anchor side (one shuffle saved).
    assigned = assigned.withColumn(
        "__side",
        F.when(F.col(order_col) < F.col("__a_ord"), "before").otherwise("after"),
    )

    per_anchor = assigned.groupBy(inst, "anchor_id").agg(
        F.count(F.when(F.col("__side") == "before", 1)).alias("n_before"),
        F.count(F.when(F.col("__side") == "after", 1)).alias("n_after"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__side") == "before",
                        F.struct(F.col(order_col).alias("o"), F.col("__payload").alias("p")),
                    )
                )
            ),
            lambda x: x["p"],
        ).alias("before_payloads"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__side") == "after",
                        F.struct(F.col(order_col).alias("o"), F.col("__payload").alias("p")),
                    )
                )
            ),
            lambda x: x["p"],
        ).alias("after_payloads"),
    )
    # anchors with no utterances still emit triples
    return (
        anchors.select(F.col(inst), "anchor_id")
        .join(per_anchor, [inst, "anchor_id"], "left")
        .fillna({"n_before": 0, "n_after": 0})
    )


def author_filter(
    triples: DataFrame,
    allowed_authors: Column,
    before_col: str = "before_payloads",
    after_col: str = "after_payloads",
    author_field: str = "author_id",
) -> DataFrame:
    """distill2 (reference distill2_authors.py:61-64): keep only
    before/after utterances authored by the command author or a DM.
    ``allowed_authors`` is an array column of permitted author ids."""
    keep = lambda col: F.filter(  # noqa: E731
        F.col(col), lambda m: F.array_contains(allowed_authors, m[author_field])
    )
    return triples.withColumn(before_col, keep(before_col)).withColumn(
        after_col, keep(after_col)
    )


def ic_regex_stage(
    df: DataFrame, text_col: str
) -> DataFrame:
    """distill3a (reference distill3a_ic_regex.py:34-62): strip
    parenthetical asides, drop rows left blank."""
    from fireball_data_processing_spark.functions.text import strip_parentheticals

    out = df.withColumn(text_col, strip_parentheticals(F.col(text_col)))
    return out.filter(F.trim(F.col(text_col)) != "")
