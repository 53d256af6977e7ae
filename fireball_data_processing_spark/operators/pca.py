"""Distributed PCA by power iteration over an embedding column: the top
principal component of the (mean-centered) vector corpus, WITHOUT ever
materializing the d x d covariance matrix — each iteration is one scan
computing the per-row projection ``s = (x - mu) . v`` as a pure codegen
expression and one d-column aggregate of ``sum((x - mu)_i * s)``, i.e.
the matvec ``S v`` against the scatter matrix folded into a single
partial-combining pass.

Why it belongs in the curation engine: the top component is the
dominant axis of embedding variance — the "is this corpus one blob or
two?" diagnostic behind semantic-dedup/cluster quality, the whitening
direction ANN quantizers remove first, and (via the variance share) a
one-number answer to "how anisotropic are these embeddings?".

Execution contract (the kmeans shape, operators/clustering.py): model
state (mu, v — d floats each) is collected to the driver per iteration
(a BOUNDED d-sized collect, the sanctioned exception to the zero-collect
policy) and re-enters the next scan as literals, so every per-row
expression stays inside whole-stage codegen — no explode (which would
inflate the scan d-fold), no joins, no windows. Every aggregate and
every derived scalar is rounded to ``round_dp``, so an unrolled SQL
oracle (dim-exploded joins — same arithmetic, different shape) replays
the trajectory exactly.

Scale: n_iter + 2 scans of the vector corpus total; each exchange
carries d partial sums per partition. Deterministic start
``v0 = (1/sqrt(d), ...)``; convergence to the top eigenvector needs
v0 not orthogonal to it — all-positive v0 is safe for real corpora and
the trajectory is engine-replayed bit-for-bit regardless.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pca_fit",
    "pca_project_expr",
    "power_iteration_pca",
    "power_iteration_pca_k",
]


def pca_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_iter: int = 6,
    round_dp: int = 8,
) -> tuple[list[float], list[float], float, float]:
    """Fit the top component and return the bounded model state as
    plain lists — ``(mu, v, nrm, total_scatter)`` — for callers that
    project with :func:`pca_project_expr` (the centroid-literal pattern
    of operators/clustering.py: model re-enters the plan as codegen
    constants, so projection adds ZERO joins/exchanges)."""
    x = [F.col(vec_col)[i].cast("double") for i in range(dim)]
    mu_row = df.agg(
        *[F.round(F.avg(x[i]), round_dp).alias(f"m{i}") for i in range(dim)]
    ).first()
    mu = [mu_row[f"m{i}"] for i in range(dim)]
    c = [x[i] - F.lit(mu[i]) for i in range(dim)]
    tot_row = df.agg(
        F.round(
            F.sum(sum((c[i] * c[i] for i in range(dim)), F.lit(0.0))),
            round_dp,
        ).alias("tot")
    ).first()
    v, nrm = _component(df, c, dim, n_iter, round_dp)
    return mu, v, nrm, tot_row["tot"]


def pca_project_expr(
    vec_col: str, mu: list[float], v: list[float], round_dp: int = 8
):
    """The projection ``(x - mu) . v`` as a single codegen Column —
    literal model state, no joins. Rounded to ``round_dp`` so an
    oracle's join-form projection reproduces it."""
    dim = len(mu)
    x = [F.col(vec_col)[i].cast("double") for i in range(dim)]
    return F.round(
        sum(
            ((x[i] - F.lit(mu[i])) * F.lit(v[i]) for i in range(dim)),
            F.lit(0.0),
        ),
        round_dp,
    )


def _component(df, c, dim, n_iter, round_dp):
    """One power-iteration component over centered expressions ``c``:
    returns (loading list, ||S v|| norm), both ``round_dp``-rounded.

    The centered values and the per-row projection are materialized as
    REAL COLUMNS before the d-sum aggregate — inlining the d-term
    projection into each of the d sums builds a d^2-operation aggregate
    expression that overflows whole-stage codegen's method-size limit
    and falls back to interpreted evaluation (measured 33 s at sf0.1 vs
    ~1 s with the projection materialized; same arithmetic, same
    rounded values, so the oracle is untouched)."""
    base = df.select(*[c[i].alias(f"__c{i}") for i in range(dim)])
    cc = [F.col(f"__c{i}") for i in range(dim)]
    v = [round(1.0 / math.sqrt(dim), round_dp)] * dim
    nrm = None
    for _ in range(n_iter):
        s = F.round(
            sum((cc[i] * F.lit(v[i]) for i in range(dim)), F.lit(0.0)),
            round_dp,
        )
        scored = base.withColumn("__s", s)
        u_row = scored.agg(
            *[
                F.round(F.sum(cc[i] * F.col("__s")), round_dp).alias(f"u{i}")
                for i in range(dim)
            ]
        ).first()
        u = [u_row[f"u{i}"] for i in range(dim)]
        nrm = round(math.sqrt(sum(ui * ui for ui in u)), round_dp)
        v = [round(ui / nrm, round_dp) for ui in u]
    return v, nrm


def power_iteration_pca_k(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_components: int = 2,
    n_iter: int = 6,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Top ``n_components`` principal components via power iteration
    with HOTELLING DEFLATION: after extracting component v, the
    centered expressions are replaced by ``c - (c . v) v`` (pure
    codegen arithmetic with v as literals — the deflated frame is never
    materialized), and the next component is extracted from the
    residual. Returns ``n_components * dim`` rows
    ``(component, dim, loading, eigenvalue, var_share)`` ordered by
    (component, dim); var_share is each eigenvalue's share of TOTAL
    scatter, so shares across components are comparable and sum below
    1. Same bounded-collect contract and per-value rounding as
    :func:`power_iteration_pca`."""
    x = [F.col(vec_col)[i].cast("double") for i in range(dim)]
    mu_row = df.agg(
        *[F.round(F.avg(x[i]), round_dp).alias(f"m{i}") for i in range(dim)]
    ).first()
    mu = [mu_row[f"m{i}"] for i in range(dim)]
    c = [x[i] - F.lit(mu[i]) for i in range(dim)]
    tot_row = df.agg(
        F.round(
            F.sum(sum((c[i] * c[i] for i in range(dim)), F.lit(0.0))),
            round_dp,
        ).alias("tot")
    ).first()
    total_scatter = tot_row["tot"]

    rows = []
    for comp in range(1, n_components + 1):
        v, nrm = _component(df, c, dim, n_iter, round_dp)
        for i in range(dim):
            rows.append(
                (
                    comp,
                    i + 1,
                    round(v[i], out_dp),
                    round(nrm, out_dp),
                    round(nrm / total_scatter, out_dp),
                )
            )
        proj = F.round(
            sum((c[i] * F.lit(v[i]) for i in range(dim)), F.lit(0.0)),
            round_dp,
        )
        c = [c[i] - proj * F.lit(v[i]) for i in range(dim)]
    return (
        df.sparkSession.createDataFrame(
            rows,
            "component bigint, dim bigint, loading double, "
            "eigenvalue double, var_share double",
        )
        .orderBy("component", "dim")
    )


def power_iteration_pca(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_iter: int = 6,
    round_dp: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Top principal component of ``vec_col`` (array<float/double>,
    ``dim`` entries). Returns ``dim`` rows
    ``(dim, loading, eigenvalue, var_share)`` ordered by 1-based dim:
    the unit loading vector after ``n_iter`` scatter-matrix power
    steps, the scatter eigenvalue estimate ``||S v||`` of the final
    step, and its share of total scatter (= fraction of embedding
    variance the component explains)."""
    x = [F.col(vec_col)[i].cast("double") for i in range(dim)]

    mu_row = df.agg(
        *[F.round(F.avg(x[i]), round_dp).alias(f"m{i}") for i in range(dim)]
    ).first()
    mu = [mu_row[f"m{i}"] for i in range(dim)]
    c = [x[i] - F.lit(mu[i]) for i in range(dim)]

    tot_row = df.agg(
        F.round(
            F.sum(sum((c[i] * c[i] for i in range(dim)), F.lit(0.0))),
            round_dp,
        ).alias("tot")
    ).first()
    total_scatter = tot_row["tot"]

    v, nrm = _component(df, c, dim, n_iter, round_dp)

    spark = df.sparkSession
    rows = [
        (i + 1, round(v[i], out_dp))
        for i in range(dim)
    ]
    out = spark.createDataFrame(rows, "dim bigint, loading double")
    return out.select(
        "dim",
        "loading",
        F.lit(round(nrm, out_dp)).alias("eigenvalue"),
        F.lit(round(nrm / total_scatter, out_dp)).alias("var_share"),
    ).orderBy("dim")
