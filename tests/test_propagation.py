"""Label propagation over the near-dup graph (operators/propagation.py):
hand-computed smoothing values, isolated-node invariance, symmetry."""

from __future__ import annotations

from fireball_data_processing_spark.operators.propagation import (
    propagate_scores,
)


def _run(spark, nodes, edges, **kw):
    n = spark.createDataFrame(nodes, "doc_id bigint, score0 double")
    e = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = propagate_scores(n, e, id_col="doc_id", score_col="score0", **kw)
    return {r["doc_id"]: (r["score0"], r["score"]) for r in out.collect()}


def test_chain_two_rounds_hand_computed(spark):
    # a(0.0) - b(1.0) - c(0.5), alpha=0.5
    got = _run(
        spark,
        [(1, 0.0), (2, 1.0), (3, 0.5)],
        [(1, 2), (2, 3)],
        alpha=0.5,
        n_iter=2,
    )
    # round 1: s(a)=0.5*0+0.5*1=0.5; s(b)=0.5*1+0.5*avg(0,0.5)=0.625;
    #          s(c)=0.5*0.5+0.5*1=0.75
    # round 2: s(a)=0.5*0+0.5*0.625=0.3125;
    #          s(b)=0.5*1+0.5*avg(0.5,0.75)=0.8125;
    #          s(c)=0.5*0.5+0.5*0.625=0.5625
    assert got[1] == (0.0, 0.3125)
    assert got[2] == (1.0, 0.8125)
    assert got[3] == (0.5, 0.5625)


def test_isolated_node_keeps_prior(spark):
    got = _run(
        spark,
        [(1, 0.2), (2, 0.9), (3, 0.4)],
        [(1, 2)],
        n_iter=3,
    )
    assert got[3] == (0.4, 0.4)


def test_edges_are_symmetrized(spark):
    # only (1,2) given, but 1 must also be 2's neighbor
    got = _run(spark, [(1, 0.0), (2, 1.0)], [(1, 2)], n_iter=1)
    assert got[1] == (0.0, 0.5)
    assert got[2] == (1.0, 0.5)


def test_uniform_scores_are_fixed_point(spark):
    got = _run(
        spark,
        [(i, 0.7) for i in range(1, 6)],
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
        n_iter=3,
    )
    assert all(v == (0.7, 0.7) for v in got.values())
