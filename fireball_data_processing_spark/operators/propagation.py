"""Score propagation over the near-duplicate graph (iterative label
propagation), the curation signal the per-document gates can't see: a
document whose near-duplicates are low-quality is itself suspect, even
when its own surface statistics pass — template spam and boilerplate
farms present exactly this way (many mutually-similar documents, each
individually unremarkable). Propagating a quality prior through the LSH
candidate graph blends each document's own score with its duplicate
neighborhood's.

Extends the reference's per-document heuristics (which never relate
documents to each other) with the graph smoothing step; the graph itself
comes from the engine's existing MinHash/LSH candidate generation
(operators/dedup.py), so no new similarity machinery.

Scale design:

- **Edges are LSH candidates, not all pairs**: the graph is bounded by
  band-bucket collisions (the near-dedup scale path), never |V|^2.
- **Per iteration: two key-hash shuffles** — join scores to edge
  destinations (shuffle by id), average per source (shuffle by id again,
  with map-side partial combine) — then a join back to the node frame on
  the same id key, which AQE plans as a reuse of the existing hash
  partitioning. Iteration count is a small constant (smoothing, not
  convergence — 2 hops reaches the neighborhood-of-neighborhood).
- **Cross-engine reproducibility**: every iteration rounds the updated
  score to ``round_dp`` decimals (the kmeans contract — see
  operators/clustering.py), absorbing neighbor-sum reassociation noise,
  so an unrolled SQL oracle replays the iterations exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["propagate_scores"]


def propagate_scores(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score0",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    alpha: float = 0.5,
    n_iter: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Iterate ``s_{t+1}(v) = round(alpha * s_0(v) + (1 - alpha) *
    avg_{u ~ v} s_t(u), round_dp)`` for ``n_iter`` rounds over the
    undirected graph given by ``edges`` (one row per pair; symmetrized
    here). Nodes with no neighbors keep their prior: the neighbor term
    coalesces to the node's own previous score, which for an isolated
    node is invariantly ``s_0``. Returns ``(id_col, score0, score)``.
    """
    # the edge frame feeds one join per iteration and the node frame
    # feeds two consumers per iteration (the neighbor aggregate and the
    # join-back) — persist both, or every iteration re-plans the full
    # upstream subtree (LSH candidate generation!) per consumer and the
    # static plan grows combinatorially (the near_dup_pairs lesson).
    # Caches are invocation-scoped: edges are candidate-pair-bounded,
    # the node frame is (id, two doubles).
    sym = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    sym = sym.union(
        sym.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
    ).persist()
    s = nodes.select(
        F.col(id_col),
        F.col(score_col).cast("double").alias("__s0"),
        F.col(score_col).cast("double").alias("__s"),
    )
    for _ in range(n_iter):
        nbr = (
            sym.join(
                s.select(
                    F.col(id_col).alias("__dst"), F.col("__s").alias("__ns")
                ),
                "__dst",
            )
            .groupBy("__src")
            .agg(F.avg("__ns").alias("__avg"))
        )
        s = (
            s.join(nbr, s[id_col] == nbr["__src"], "left")
            .select(
                F.col(id_col),
                F.col("__s0"),
                F.round(
                    F.lit(alpha) * F.col("__s0")
                    + F.lit(1.0 - alpha)
                    * F.coalesce(F.col("__avg"), F.col("__s")),
                    round_dp,
                ).alias("__s"),
            )
            .persist()
        )
    return s.select(
        F.col(id_col),
        F.col("__s0").alias("score0"),
        F.col("__s").alias("score"),
    )
