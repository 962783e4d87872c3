"""Unit pins for the PageRank power-iteration operator (operators/graph.py).

The registered query (plans/graph.py pagerank_nations) is hash-checked
against a chained-CTE DuckDB oracle; these tests pin the operator's
semantics directly on hand-sized graphs where the recurrence can be
replicated in plain Python, including the corners the fixture graph never
exercises (dangling nodes, isolated nodes, empty graphs).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.operators.graph import (
    RANK_SCALE,
    pagerank,
)


def _reference_pagerank(edges, nodes, iterations, damping):
    """Plain-Python replica of the operator's recurrence, fixed-point floor
    included, so expected values are bit-identical, not approximate."""
    n = len(nodes)
    out_w = {}
    for src, _dst, w in edges:
        out_w[src] = out_w.get(src, 0) + w
    ranks = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        in_sum = {v: 0 for v in nodes}
        for src, dst, w in edges:
            share = float(w) / float(out_w[src])
            in_sum[dst] += math.floor((ranks[src] * share) * RANK_SCALE)
        ranks = {v: base + damping * (in_sum[v] / RANK_SCALE) for v in nodes}
    return ranks


def _run(spark, edges, nodes, iterations=3, damping=0.85):
    edf = spark.createDataFrame(edges, "src int, dst int, weight bigint")
    ndf = spark.createDataFrame([(v,) for v in nodes], "node int")
    got = pagerank(edf, ndf, iterations=iterations, damping=damping)
    return {r["node"]: r["rank"] for r in got.collect()}


def test_pagerank_matches_python_reference_bit_identical(spark):
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 1), (3, 0, 5)]
    nodes = [0, 1, 2, 3]
    got = _run(spark, edges, nodes)
    want = _reference_pagerank(edges, nodes, 3, 0.85)
    assert got == want  # exact equality: the fixed-point contract


def test_pagerank_dangling_node_receives_but_leaks(spark):
    # 0 -> 1, and 1 has no out-edges: 1 keeps receiving, its mass leaks
    # (simplified PageRank), so total mass drops below 1 after iteration 1.
    edges = [(0, 1, 1)]
    nodes = [0, 1]
    got = _run(spark, edges, nodes, iterations=2)
    want = _reference_pagerank(edges, nodes, 2, 0.85)
    assert got == want
    assert got[1] > got[0]  # the dangling sink still accumulates rank
    assert sum(got.values()) < 1.0  # leaked mass, as documented


def test_pagerank_isolated_node_sits_at_base(spark):
    edges = [(0, 1, 1), (1, 0, 1)]
    nodes = [0, 1, 2]  # 2 has no edges at all
    got = _run(spark, edges, nodes, iterations=4)
    assert got[2] == pytest.approx((1.0 - 0.85) / 3, abs=0)


def test_pagerank_empty_node_set_returns_empty(spark):
    edf = spark.createDataFrame([], "src int, dst int, weight bigint")
    ndf = spark.createDataFrame([], "node int")
    out = pagerank(edf, ndf)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank"]


def test_pagerank_uniform_cycle_stays_uniform(spark):
    # A weighted 3-cycle with equal weights is rank-preserving: every node
    # forwards its whole mass to exactly one successor, so the uniform
    # distribution is the fixed point (up to the 1e-15 floor truncation).
    edges = [(0, 1, 7), (1, 2, 7), (2, 0, 7)]
    nodes = [0, 1, 2]
    got = _run(spark, edges, nodes, iterations=5)
    for v in nodes:
        assert got[v] == pytest.approx(1.0 / 3, abs=1e-12)


# --- triangle_counts ---------------------------------------------------------

from sqldataintegrationfunctiontriggerapp_spark.operators.graph import (  # noqa: E402
    label_propagation,
    triangle_counts,
)


def _tri(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a int, doc_b int")
    return {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}


def test_triangle_counts_single_triangle(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_star_has_none(spark):
    # hub 0 pairs with every spoke, spokes never pair with each other:
    # the template-hub shape the docstring contrasts with a clique
    assert _tri(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]) == {}


def test_triangle_counts_k4_counts_three_per_node(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_counts_each_triangle_once(spark):
    # two triangles sharing the edge (1,2)
    got = _tri(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


# --- label_propagation -------------------------------------------------------


def _lpa(spark, undirected, nodes, iterations=3):
    both = undirected + [(b, a) for a, b in undirected]
    edf = spark.createDataFrame(both, "src int, dst int")
    ndf = spark.createDataFrame([(v,) for v in nodes], "node int")
    out = label_propagation(edf, ndf, iterations=iterations)
    return {r["node"]: r["label"] for r in out.collect()}


def test_lpa_clique_converges_to_min_label(spark):
    got = _lpa(spark, [(5, 6), (6, 7), (5, 7)], [5, 6, 7])
    assert got == {5: 5, 6: 5, 7: 5}


def test_lpa_isolated_nodes_keep_own_label(spark):
    got = _lpa(spark, [], [1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}


def test_lpa_pair_is_stable_not_oscillating(spark):
    # the self-vote tie-breaks (cnt equal) to the smaller label on BOTH
    # endpoints in round 1 and stays there -- pure synchronous LPA would
    # swap forever
    for iters in (1, 2, 3):
        assert _lpa(spark, [(8, 9)], [8, 9], iterations=iters) == {8: 8, 9: 8}


def test_lpa_two_cliques_with_bridge_stay_separate(spark):
    # K3 {0,1,2} -- bridge (2,3) -- K3 {3,4,5}: min-label flooding
    # (connected components) would merge everything to 0; majority
    # voting keeps the right clique at community 3
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    got = _lpa(spark, edges, [0, 1, 2, 3, 4, 5])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


# --- triangle_delta (incremental maintenance) --------------------------------

from sqldataintegrationfunctiontriggerapp_spark.operators.graph import (  # noqa: E402
    triangle_delta,
)


def _delta(spark, pairs, new):
    pdf = spark.createDataFrame(pairs, "doc_a int, doc_b int")
    ndf = spark.createDataFrame(new, "doc_a int, doc_b int")
    return sorted(
        (r["a"], r["b"], r["c"]) for r in triangle_delta(pdf, ndf).collect()
    )


def test_triangle_delta_all_old_is_empty(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    assert _delta(spark, tri, []) == []


def test_triangle_delta_one_new_edge_each_position(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    # whichever position the new edge occupies, the triangle is found once
    for new in ([(1, 2)], [(2, 3)], [(1, 3)]):
        assert _delta(spark, tri, new) == [(1, 2, 3)]


def test_triangle_delta_multiplicity_collapsed(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    # 2 and 3 new edges: per-position enumeration hits the triangle 2 / 3
    # times; the distinct must collapse it to exactly one row
    assert _delta(spark, tri, [(1, 2), (2, 3)]) == [(1, 2, 3)]
    assert _delta(spark, tri, tri) == [(1, 2, 3)]


def test_triangle_delta_only_touching_triangles(spark):
    # two disjoint triangles; only the one touching the new edge appears
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    assert _delta(spark, pairs, [(5, 6)]) == [(4, 5, 6)]


def test_triangle_delta_matches_recount_on_k4(spark):
    # K4 with one new edge: the new edge (1,2) is in exactly 2 of the 4
    # triangles of K4 -- the incremental identity old + delta == full
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    new = [(1, 2)]
    old = [e for e in k4 if e not in new]
    got = _delta(spark, k4, new)
    assert got == [(1, 2, 3), (1, 2, 4)]
    # old graph (K4 minus one edge) holds the 2 triangles avoiding (1,2)
    old_tris = _delta(spark, old, old)
    assert sorted(old_tris) == [(1, 3, 4), (2, 3, 4)]
    assert len(old_tris) + len(got) == 4  # == triangles of K4
