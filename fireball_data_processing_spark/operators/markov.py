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

__all__ = [
    "transition_matrix",
    "stationary_distribution",
    "markov_profile",
    "raw_transition_probs",
    "removal_attribution",
]


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
    # localCheckpoint, not persist: n_iter iterations re-expand the
    # corpus lead-window subtree under every reference in the STATIC
    # plan (the removal_attribution lesson: 361 scans -> 0); the frame
    # is |states|^2 rows, so truncating lineage is free.
    m = matrix.select("src", "dst", "p").localCheckpoint()
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
    mat = mat.localCheckpoint()
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


def raw_transition_probs(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    round_dp: int = 8,
) -> DataFrame:
    """Un-renormalized empirical transition probabilities: one row per
    observed (src, dst) with ``p = n / total_out(src)`` over ALL
    observed successors — unlike :func:`transition_matrix`, nothing is
    dropped or renormalized, which is what attribution needs (removing
    a channel must LOSE its probability mass, not redistribute it).
    Same plan shape: one lead window + one pair-count aggregate."""
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
    tot = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot), round_dp
        ).alias("p"),
    )


def _absorption(matrix, conv_state, removed, n_iter, round_dp):
    """Absorption probability into ``conv_state`` per transient state,
    with ``removed`` (a state name or None) excluded from the chain —
    transitions into it are LOST mass. ``n_iter`` fixed-point steps
    ``a <- direct + P_transient @ a`` from a = 0, each iterate rounded.
    All frames are at most |states|^2 rows."""
    m = matrix.filter(F.col("src") != conv_state)
    if removed is not None:
        m = m.filter(
            (F.col("src") != removed) & (F.col("dst") != removed)
        )
    m = m.persist()
    direct = m.filter(F.col("dst") == conv_state).select(
        F.col("src").alias("state"), F.col("p").alias("d")
    )
    trans = m.filter(F.col("dst") != conv_state)
    states = m.select(F.col("src").alias("state")).distinct()
    a = states.join(direct, "state", "left").select(
        "state", F.round(F.coalesce(F.col("d"), F.lit(0.0)), round_dp).alias("a")
    )
    for _ in range(n_iter - 1):
        flow = (
            trans.join(
                F.broadcast(a.withColumnRenamed("state", "dst")), "dst"
            )
            .groupBy(F.col("src").alias("state"))
            .agg(F.round(F.sum(F.col("p") * F.col("a")), round_dp).alias("f"))
        )
        a = (
            states.join(direct, "state", "left")
            .join(flow, "state", "left")
            .select(
                "state",
                F.round(
                    F.coalesce(F.col("d"), F.lit(0.0))
                    + F.coalesce(F.col("f"), F.lit(0.0)),
                    round_dp,
                ).alias("a"),
            )
        )
    return a


def removal_attribution(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    conv_state: str,
    n_iter: int = 12,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014, the
    standard data-driven alternative to last-touch credit): model each
    user's event stream as a first-order chain ABSORBED at the first
    ``conv_state``; overall conversion probability is the start-state
    mix pushed through ``n_iter`` absorption fixed-point steps; a
    channel's REMOVAL EFFECT is the relative conversion lost when every
    transition through it becomes lost mass:

        effect(c) = 1 - conv(chain without c) / conv(full chain)

    Returns one row per transient state:
    ``(state, start_share, conv_full, conv_removed, removal_effect)``
    ordered by state.

    Scale shape: the data-proportional work is the lead window + pair
    count (shared by all scenarios) and one first-event-per-user
    aggregate; each of the |states| removal scenarios re-runs the
    fixed point on the persisted |states|^2-row matrix — sub-kilobyte
    joins, zero collects. The unrolled oracle replays every scenario's
    trajectory via per-iterate rounding."""
    # localCheckpoint (eager), not persist: the |states|^2-row matrix is
    # consumed by 5 scenarios x n_iter iterations x 3 subframes — with a
    # lazy persist the STATIC plan re-expands the corpus lead-window
    # subtree under every reference (measured 361 scans / 1192 shuffles
    # pre-execution); truncating lineage on the tiny frame collapses
    # every downstream plan to a cached-scan leaf. Executor-lifetime
    # durability is fine here: the frame is rebuilt by re-running the
    # operator, never reused across jobs (contrast setjoin's parquet
    # checkpoint_dir option for long-lived artifacts).
    matrix = raw_transition_probs(
        df, key_col, order_col, state_col, round_dp
    ).localCheckpoint()
    w = Window.partitionBy(key_col).orderBy(order_col)
    firsts = (
        df.select(
            F.col(key_col).alias("__k"),
            F.row_number().over(w).alias("__r"),
            F.col(state_col).alias("state"),
        )
        .filter(F.col("__r") == 1)
        .groupBy("state")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    tot = Window.partitionBy()
    start = firsts.select(
        "state",
        F.round(F.col("__c") / F.sum("__c").over(tot), round_dp).alias("pi0"),
    ).localCheckpoint()

    def conv_of(a):
        # start mass already AT the conversion state converts with prob 1
        direct_start = start.filter(F.col("state") == conv_state).select(
            F.col("pi0").alias("v")
        )
        routed = (
            start.filter(F.col("state") != conv_state)
            .join(a, "state", "left")
            .select(
                (F.col("pi0") * F.coalesce(F.col("a"), F.lit(0.0))).alias("v")
            )
        )
        return routed.unionByName(direct_start).agg(
            F.round(F.sum("v"), round_dp).alias("conv")
        )

    full = conv_of(
        _absorption(matrix, conv_state, None, n_iter, round_dp)
    )
    # bounded |states|-sized collect (the kmeans contract): scenario
    # enumeration is driver-side control flow, one chain per channel.
    # Channels that only RECEIVE traffic (no outgoing edges) still get
    # a row — their removal effect is well-defined (usually 0: their
    # incoming mass was already lost).
    all_states = (
        matrix.select(F.col("src").alias("s"))
        .unionByName(matrix.select(F.col("dst").alias("s")))
        .distinct()
        .collect()
    )
    transient = sorted(
        r["s"] for r in all_states if r["s"] != conv_state
    )
    rows = []
    for c in transient:
        a_c = _absorption(matrix, conv_state, c, n_iter, round_dp)
        conv_c = conv_of(a_c)
        rows.append(
            conv_c.select(
                F.lit(c).alias("state"),
                F.col("conv").alias("conv_removed"),
            )
        )
    removed = rows[0]
    for extra in rows[1:]:
        removed = removed.unionByName(extra)
    return (
        removed.crossJoin(F.broadcast(full))
        .join(start, "state", "left")
        .select(
            "state",
            F.round(F.coalesce(F.col("pi0"), F.lit(0.0)), out_dp).alias(
                "start_share"
            ),
            F.round(F.col("conv"), out_dp).alias("conv_full"),
            F.round(F.col("conv_removed"), out_dp).alias("conv_removed"),
            F.round(
                F.lit(1.0) - F.col("conv_removed") / F.col("conv"), out_dp
            ).alias("removal_effect"),
        )
        .orderBy("state")
    )
