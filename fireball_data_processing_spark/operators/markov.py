"""Markov-chain analytics over event sequences: the empirical
transition matrix of per-user event streams and its stationary
distribution via power iteration — "where does a user's session
equilibrate?", the chain-level summary that per-event counts and the
funnel's fixed step list both miss (the funnel asks about ONE ordained
path; the stationary distribution ranks every state by long-run
occupancy under the observed dynamics).

Extends the reference's sequential surface (its FSMs at
``heuristics/__init__.py``-era event walks consume transitions one at a
time) with the aggregate view: estimate P once, then ask global
questions of it.

Scale design:

- **The data-proportional work is ONE window + ONE groupBy**: next-state
  pairing is a ``lead`` over the per-user hash exchange (same shape as
  sessionization), and the pair count is a partial-combining aggregate
  onto at most |states|^2 rows. Everything after — normalization, power
  iteration — runs on the tiny matrix frame, never on the data.
- **Zero collects**: the matrix and the iterate both stay DataFrames;
  each power step is a broadcast-joined matvec (pi is |states| rows, P
  is |states|^2) and the matrix frame is persisted once so 20 steps
  don't re-plan the corpus-side subtree 20 times.
- **Cross-engine replay** (the kmeans contract): row-normalized
  probabilities and each iterate are rounded to ``round_dp``, so an
  unrolled SQL oracle reproduces the trajectory bit-for-bit.
- **Dangling states**: states that appear only as a successor have no
  outgoing row; transitions INTO them are dropped and rows renormalized
  over the kept destinations, keeping P row-stochastic on the
  src-state space (the standard strongly-connected restriction; at
  sf>=0.001 every event type both enters and leaves, so the filter is
  a no-op safety net rather than a data change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["transition_matrix", "stationary_distribution", "markov_profile"]


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    round_dp: int = 8,
) -> DataFrame:
    """Empirical first-order transition matrix of ``state_col`` along
    ``order_col`` within each ``key_col`` sequence. Returns one row per
    observed (src, dst) pair restricted to dst-states that also occur
    as src (see module note on dangling states):
    ``(src, dst, n, p)`` with ``p`` row-normalized over the kept
    destinations and rounded to ``round_dp``.

    One hash exchange on ``key_col`` for the lead window, one
    partial-combining pair count, then arithmetic on the matrix frame.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    pairs = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    srcs = pairs.select(F.col("src").alias("dst")).distinct()
    kept = pairs.join(F.broadcast(srcs), "dst", "left_semi")
    tot = Window.partitionBy("src")
    return kept.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot), round_dp
        ).alias("p"),
    )


def stationary_distribution(
    matrix: DataFrame,
    n_iter: int = 12,
    round_dp: int = 8,
) -> DataFrame:
    """Power iteration ``pi <- pi @ P`` from the uniform start, exactly
    ``n_iter`` steps, each iterate rounded to ``round_dp`` (engine
    replay). ``matrix`` is the (src, dst, p) frame from
    transition_matrix. Returns ``(state, pi)``.

    Every step is a join of a |states|-row frame with the persisted
    |states|^2-row matrix — sub-kilobyte exchanges regardless of input
    scale.
    """
    m = matrix.select("src", "dst", "p").persist()
    states = m.select(F.col("src").alias("state")).distinct()
    k = F.broadcast(states.agg(F.count(F.lit(1)).alias("__k")))
    pi = states.crossJoin(k).select(
        "state", F.round(F.lit(1.0) / F.col("__k"), round_dp).alias("pi")
    )
    for _ in range(n_iter):
        pi = (
            m.join(
                F.broadcast(pi.withColumnRenamed("state", "src")), "src"
            )
            .groupBy(F.col("dst").alias("state"))
            .agg(F.round(F.sum(F.col("pi") * F.col("p")), round_dp).alias("pi"))
        )
    return pi


def markov_profile(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    n_iter: int = 12,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Per-state chain profile: out-transition count, self-loop
    probability, and the ``n_iter``-step power-iterate of the stationary
    distribution. Returns ``(state, n_out, self_prob, stationary_prob)``
    ordered by state."""
    mat = transition_matrix(df, key_col, order_col, state_col, round_dp)
    mat = mat.persist()
    pi = stationary_distribution(mat, n_iter=n_iter, round_dp=round_dp)
    per_src = mat.groupBy(F.col("src").alias("state")).agg(
        F.sum("n").cast("bigint").alias("n_out"),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("src") == F.col("dst"), F.col("p"))),
                F.lit(0.0),
            ),
            out_dp,
        ).alias("self_prob"),
    )
    return (
        per_src.join(pi, "state")
        .select(
            "state",
            "n_out",
            "self_prob",
            F.round(F.col("pi"), out_dp).alias("stationary_prob"),
        )
        .orderBy("state")
    )
