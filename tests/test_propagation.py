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


def test_triangle_census_hand_graph(spark):
    from fireball_data_processing_spark.operators.propagation import (
        graph_triangle_stats,
    )

    # triangle 1-2-3 plus pendant 4 on vertex 1; one edge given reversed
    # and one duplicated — orientation and dedup must absorb both
    edges = spark.createDataFrame(
        [(1, 2), (3, 1), (2, 3), (1, 4), (2, 1)], "id_a bigint, id_b bigint"
    )
    r = graph_triangle_stats(edges).first()
    # degrees 3,2,2,1 -> wedges 3+1+1+0 = 5; one triangle
    assert (
        r["n_vertices"], r["n_edges"], r["n_wedges"], r["n_triangles"]
    ) == (4, 4, 5, 1)
    assert r["transitivity"] == 0.6


def test_triangle_census_triangle_free_graph(spark):
    from fireball_data_processing_spark.operators.propagation import (
        graph_triangle_stats,
    )

    # a path 1-2-3-4: wedges exist, triangles don't
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a bigint, id_b bigint"
    )
    r = graph_triangle_stats(edges).first()
    assert r["n_triangles"] == 0 and r["n_wedges"] == 2
    assert r["transitivity"] == 0.0


def test_triangle_census_complete_graph_transitivity_one(spark):
    from itertools import combinations

    from fireball_data_processing_spark.operators.propagation import (
        graph_triangle_stats,
    )

    edges = spark.createDataFrame(
        list(combinations(range(5), 2)), "id_a bigint, id_b bigint"
    )
    r = graph_triangle_stats(edges).first()
    assert r["n_triangles"] == 10  # C(5,3)
    assert r["transitivity"] == 1.0


def test_audience_overlap_hand_computed(spark):
    from fireball_data_processing_spark.operators.profile import (
        audience_overlap,
    )

    # users: 1 does a+b, 2 does a, 3 does b+c, 4 does a+b+c
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"),
        (3, "b"), (3, "c"),
        (4, "a"), (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "uid bigint, seg string")
    got = {
        (r["cat_a"], r["cat_b"]): (r["n_a"], r["n_b"], r["n_both"], r["jaccard"])
        for r in audience_overlap(df, "uid", "seg", ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == (3, 3, 2, 0.5)
    assert got[("a", "c")] == (3, 2, 1, 0.25)
    assert got[("b", "c")] == (3, 2, 2, round(2 / 3, 6))


def test_audience_overlap_disjoint_segments(spark):
    from fireball_data_processing_spark.operators.profile import (
        audience_overlap,
    )

    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "uid bigint, seg string")
    r = audience_overlap(df, "uid", "seg", ["a", "b"]).first()
    assert (r["n_a"], r["n_b"], r["n_both"], r["jaccard"]) == (1, 1, 0, 0.0)
