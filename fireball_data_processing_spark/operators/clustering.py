"""Distributed k-means clustering over embedding columns (Lloyd's
algorithm), the corpus-organization primitive the published semantic
curation recipes start from: SemDeDup (Abbas et al. 2023) clusters the
corpus with k-means FIRST and dedups within clusters; D4 / SSL-prototypes
do the same for diversity selection. The engine's
:func:`..similarity.semantic_dedup` uses sign-LSH buckets as its
partition; this module supplies the k-means partition for pipelines that
want the paper-faithful shape.

Extends the reference's embedding surface (``embed_findings.py`` stores
vectors; it never clusters them) with the standard corpus primitive.

Scale design (the classic Spark k-means shape, same as MLlib's):

- **Centroids are tiny; points are huge.** Each Lloyd iteration collects
  the k×dim centroid table to the driver (k-sized, bounded — the house
  bounded-collect idiom) and re-enters it as a LITERAL array, so
  assignment is a pure per-row projection: no join, no shuffle, fully
  codegen. The only shuffle per iteration is the k×dim-row centroid
  recompute aggregate (map-side partial combine does almost all the
  work).
- **Argmin without lambda re-evaluation**: distances materialize as an
  ``array<struct<dist,cid>>`` via one ``transform``, then ``array_min``
  picks the (dist, cid)-lexicographic minimum — deterministic tie-break
  by cluster id, and the distance expression is evaluated exactly once
  per centroid (HOF lambda bodies get no subexpression elimination — the
  winnowing lesson, see functions/textstats.py).
- **Cross-engine reproducibility**: distances accumulate sequentially in
  array order via ``aggregate`` (same fold order as DuckDB's
  ``list_sum``), and recomputed centroids are ROUNDED to ``round_dp``
  decimals each iteration — identical inputs to the next iteration's
  distance math in any engine, so an exact SQL oracle can replay the
  unrolled iterations. Rounding k×dim centroid coordinates perturbs the
  clustering immeasurably and is part of the operator contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_assign",
    "kmeans_fit",
    "kmeans_summary",
    "nearest_centroid_expr",
    "nearest_centroids_expr",
]


def _dist2(vec: Column, ctr: Column) -> Column:
    """Squared L2 distance, sequential left-to-right accumulation in
    array order (bit-reproducible across engines for identical inputs)."""
    return F.aggregate(
        F.zip_with(vec, ctr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _centroid_literal(centroids: list[tuple[int, list[float]]]) -> Column:
    """``array<struct<cid:int, v:array<double>>>`` literal from the
    driver-side centroid list (k×dim — bounded by construction)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("v"),
            )
            for cid, vec in centroids
        ]
    )


def _bind_once(vec: Column, body) -> Column:
    """Evaluate ``vec`` ONCE per row and hand the materialized value to
    ``body`` as a lambda variable: HOF lambda bodies get no common-
    subexpression elimination (the winnowing lesson), so a COMPOSITE
    ``vec`` expression (e.g. an rp-sketch projection) referenced inside
    the per-centroid distance lambda would otherwise be recomputed k
    times per row — the inlining that previously forced callers like
    ``rp_ivf_topk`` to persist a sketch frame just to pin evaluation.
    Wrapping the value in a 1-element array and transforming binds it
    to a NamedLambdaVariable, which the inner lambdas reference instead
    of re-evaluating."""
    return F.element_at(F.transform(F.array(vec), body), 1)


def nearest_centroid_expr(
    centroids: list[tuple[int, list[float]]], vec: Column
) -> Column:
    """``struct<d:double, cid:int>`` of the row's nearest centroid — the
    assignment as a pure COLUMN EXPRESSION, usable anywhere a projection
    is (batch, streams, as another operator's partition key). Ties break
    to the lowest cluster id (struct-lexicographic ``array_min`` over
    (dist2, cid)); the distance expression is evaluated once per
    centroid, and ``vec`` itself once per ROW (``_bind_once``), so a
    composite vector expression never multiplies by k. ``vec`` should
    already be ``array<double>``."""
    return _bind_once(
        vec,
        lambda v: F.array_min(
            F.transform(
                _centroid_literal(centroids),
                lambda c: F.struct(
                    _dist2(v, c["v"]).alias("d"), c["cid"].alias("cid")
                ),
            )
        ),
    )


def nearest_centroids_expr(
    centroids: list[tuple[int, list[float]]], vec: Column, n_probe: int
) -> Column:
    """The row's ``n_probe`` nearest centroids as an
    ``array<struct<d:double, cid:int>>``, (dist2, cid)-lexicographic —
    the multi-probe generalization of :func:`nearest_centroid_expr`,
    which IVF-style index probing needs (a query inspects its few
    nearest cells, not just the winner). Same determinism contract:
    sequential-fold distances, lowest-cid tie-break, once-per-row
    ``vec`` evaluation, all inside one codegen projection."""
    return _bind_once(
        vec,
        lambda v: F.slice(
            F.array_sort(
                F.transform(
                    _centroid_literal(centroids),
                    lambda c: F.struct(
                        _dist2(v, c["v"]).alias("d"), c["cid"].alias("cid")
                    ),
                )
            ),
            1,
            n_probe,
        ),
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every row to its nearest centroid:
    ``(id_col, cluster_id, dist2)``. Pure projection — the centroid list
    enters as a literal, so the plan is scan → codegen, zero exchanges.
    Ties break to the lowest cluster id (struct-lexicographic
    ``array_min`` over (dist2, cid))."""
    vec = F.col(vec_col).cast("array<double>")
    best = nearest_centroid_expr(centroids, vec)
    return df.select(
        F.col(id_col),
        best["cid"].alias("cluster_id"),
        best["d"].alias("dist2"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd's k-means with deterministic initialization (the ``k``
    lowest-``id_col`` vectors seed clusters 0..k-1 — reproducible and
    oracle-replayable, unlike random init; production corpus runs swap in
    k-means|| seeding by passing their own centroids to
    :func:`kmeans_assign`). Runs exactly ``n_iter`` assign→recompute
    rounds, then returns ``(assignments, centroids)`` where assignments
    is the final :func:`kmeans_assign` output.

    Per iteration: one bounded k×dim collect (centroid table) + one
    aggregate shuffle (recompute); assignment itself never shuffles. An
    empty cluster keeps its previous centroid (standard Lloyd handling,
    and what the SQL replay does via the COALESCE join).
    """
    vec = F.col(vec_col).cast("array<double>")
    # rounding happens in SQL (HALF_UP, matching DuckDB/ANSI ROUND) —
    # Python round() is banker's and would diverge on exact .5 boundaries
    seed_rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.transform(vec, lambda x: F.round(x, round_dp)).alias("__v"),
        )
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    centroids = [
        (i, [float(x) for x in r["__v"]]) for i, r in enumerate(seed_rows)
    ]
    for _ in range(n_iter):
        # element-wise mean per cluster: posexplode -> (cluster, dim) avg
        # -> k×dim rows, collected bounded (same size as the literal we
        # re-enter). The assignment rides in the SAME projection as the
        # vector (no join-back — assignment is a pure expression), and
        # sort_array(collect_list(struct(pos, avg))) rebuilds coordinate
        # order without an ORDER BY shuffle.
        best = nearest_centroid_expr(centroids, vec)
        means = (
            df.select(best["cid"].alias("cluster_id"), vec.alias("__v"))
            .select("cluster_id", F.posexplode("__v").alias("__pos", "__x"))
            .groupBy("cluster_id", "__pos")
            .agg(F.round(F.avg("__x"), round_dp).alias("__m"))
            .groupBy("cluster_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__pos", "__m"))
                ).alias("__coords")
            )
            .collect()
        )
        new = {
            int(r["cluster_id"]): [float(c["__m"]) for c in r["__coords"]]
            for r in means
        }
        centroids = [(cid, new.get(cid, old)) for cid, old in centroids]
    return kmeans_assign(df, centroids, vec_col, id_col), centroids


def kmeans_summary(assigned: DataFrame, round_dp: int = 6) -> DataFrame:
    """Per-cluster footprint: ``(cluster_id, n_points, inertia)`` with
    inertia = sum of squared distances, rounded (sum order across rows is
    engine-dependent; rounding absorbs the reassociation noise)."""
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.round(F.sum("dist2"), round_dp).alias("inertia"),
    )
