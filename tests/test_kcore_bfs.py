"""k-core and multi-source BFS differential tests vs the independent
Python oracle (exact equality — same contract as the CC/LPA suite)."""

import pytest

from pagerank_optimization_spark.operators.bfs import bfs_distances
from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.kcore import kcore
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 150, seed=7).cache()
    vertices, wedges = build_graph(transcripts)
    vertices, wedges = vertices.cache(), wedges.cache()
    rows = [r.asDict() for r in transcripts.select("conv_id", "turn_idx", "role", "tool").collect()]
    o_edges = oracle.derive_edges(rows)
    o_vertices = oracle.vertices_of(rows, o_edges)
    return vertices, wedges, o_vertices, o_edges


@pytest.mark.parametrize("k", [2, 3, 5])
def test_kcore_exact(graph, k):
    vertices, wedges, o_vertices, o_edges = graph
    got = {r.entity for r in kcore(vertices, wedges, k=k).collect()}
    assert got == oracle.kcore(o_vertices, o_edges, k)


def test_kcore_known_graph(spark):
    """Triangle + pendant path: the 2-core is exactly the triangle."""
    vertices = spark.createDataFrame([(v,) for v in "abcde"], "entity string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    assert {r.entity for r in kcore(vertices, edges, k=2).collect()} == {"a", "b", "c"}
    assert kcore(vertices, edges, k=3).count() == 0


def test_kcore_empty_core_terminates(spark):
    """k above the max degree empties the core without looping to
    max_rounds (the n_alive == 0 early exit)."""
    vertices = spark.createDataFrame([("a",), ("b",)], "entity string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert kcore(vertices, edges, k=2, max_rounds=5).count() == 0


def test_bfs_exact_full(graph):
    """Exhaustive BFS (run to frontier exhaustion) matches the oracle on
    every reached vertex — unreached vertices absent on both sides."""
    vertices, wedges, o_vertices, o_edges = graph
    seeds_l = [v for v in o_vertices if v.startswith("tool:")]
    seeds = vertices.filter(vertices.entity.startswith("tool:"))
    got = {r.entity: r.dist for r in bfs_distances(vertices, wedges, seeds).collect()}
    assert got == oracle.bfs_distances(o_edges, set(seeds_l))


@pytest.mark.parametrize("rounds", [0, 1, 3])
def test_bfs_fixed_rounds_prefix(graph, rounds):
    """fixed_rounds=R is exactly the R-round prefix of the full BFS."""
    vertices, wedges, o_vertices, o_edges = graph
    seeds_l = [v for v in o_vertices if v.startswith("tool:")]
    seeds = vertices.filter(vertices.entity.startswith("tool:"))
    got = {
        r.entity: r.dist
        for r in bfs_distances(vertices, wedges, seeds, fixed_rounds=rounds).collect()
    }
    assert got == oracle.bfs_distances(o_edges, set(seeds_l), rounds=rounds)


def test_bfs_min_hop_on_diamond(spark):
    """Two paths of different lengths to the same vertex: dist is the MIN
    (the vertex settles in the earlier round and the anti-join keeps the
    longer path from overwriting it)."""
    vertices = spark.createDataFrame([(v,) for v in "sabct"], "entity string")
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "t"), ("s", "b"), ("b", "c"), ("c", "t")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "entity string")
    got = {r.entity: r.dist for r in bfs_distances(vertices, edges, seeds).collect()}
    assert got == {"s": 0, "a": 1, "b": 1, "t": 2, "c": 2}


def test_bfs_seeds_not_in_vertices_ignored(spark):
    vertices = spark.createDataFrame([("a",), ("b",)], "entity string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("ghost",)], "entity string")
    got = {r.entity: r.dist for r in bfs_distances(vertices, edges, seeds).collect()}
    assert got == {"a": 0, "b": 1}


@pytest.mark.parametrize("degree_oriented", [True, False])
def test_ktruss_known_graph(spark, degree_oriented):
    """K4 ∪ a pendant triangle sharing vertex a: the 4-truss is exactly K4
    (pendant-triangle edges have support 1 and peel; K4 edges keep
    support 2 among themselves)."""
    from pagerank_optimization_spark.operators.triangles import ktruss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pend = [("a", "e"), ("a", "f"), ("e", "f")]
    e = spark.createDataFrame(k4 + pend, "src string, dst string")
    got = sorted((r.a, r.b) for r in ktruss(e, k=4, degree_oriented=degree_oriented).collect())
    assert got == sorted(k4)
    # k=3 keeps every edge (each is in ≥1 triangle)
    got3 = sorted((r.a, r.b) for r in ktruss(e, k=3, degree_oriented=degree_oriented).collect())
    assert got3 == sorted(k4 + pend)


def test_ktruss_cascade_to_empty(spark):
    """Two triangles sharing edge (b, c): (b, c) starts with support 2 but
    every other edge has support 1 — round 1 removes them, round 2 finds
    (b, c) with support 0. The 4-truss must cascade to EMPTY, which
    requires the per-round support recompute (a one-shot filter would
    wrongly keep (b, c))."""
    from pagerank_optimization_spark.operators.triangles import ktruss

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    e = spark.createDataFrame(rows, "src string, dst string")
    assert ktruss(e, k=4).count() == 0


def test_ktruss_undirected_canonicalization(spark):
    """Directed multi-edges, reverses, and self-loops collapse to the
    canonical undirected set before peeling."""
    from pagerank_optimization_spark.operators.triangles import ktruss

    rows = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = sorted((r.a, r.b) for r in ktruss(e, k=3).collect())
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_ktruss_k_below_3_raises(spark):
    from pagerank_optimization_spark.operators.triangles import ktruss

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        ktruss(e, k=2)


def _py_coreness(edges, vertices, cap):
    """Independent python peeling recompute (capped)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(vertices)
    core = {v: 0 for v in vertices}
    for k in range(1, cap + 1):
        changed = True
        while changed:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
            alive -= drop
        for v in alive:
            core[v] = k
    return core


def test_coreness_known_graph(spark):
    """Triangle (coreness 2) + tail (1) + isolated vertex (0) + K4 (3)."""
    from pagerank_optimization_spark.operators.kcore import coreness

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # triangle
        ("c", "t"),                           # tail off the triangle
        ("p", "q"), ("p", "r"), ("p", "s"), ("q", "r"), ("q", "s"), ("r", "s"),  # K4
    ]
    verts = ["a", "b", "c", "t", "p", "q", "r", "s", "iso"]
    e = spark.createDataFrame(edges, "src string, dst string")
    v = spark.createDataFrame([(x,) for x in verts], "entity string")
    got = {r.entity: r.coreness for r in coreness(v, e, max_k=8).collect()}
    assert got == _py_coreness(edges, verts, 8)
    assert got["iso"] == 0 and got["t"] == 1 and got["a"] == 2 and got["p"] == 3


def test_coreness_cap_floors_survivors(spark):
    from pagerank_optimization_spark.operators.kcore import coreness

    k4 = [("p", "q"), ("p", "r"), ("p", "s"), ("q", "r"), ("q", "s"), ("r", "s")]
    e = spark.createDataFrame(k4, "src string, dst string")
    v = spark.createDataFrame([(x,) for x in "pqrs"], "entity string")
    got = {r.entity: r.coreness for r in coreness(v, e, max_k=2).collect()}
    assert got == {x: 2 for x in "pqrs"}


def test_coreness_matches_kcore_membership(spark, graph):
    """coreness ≥ k ⟺ member of kcore(k) on the derived sf graph."""
    from pagerank_optimization_spark.operators.kcore import coreness, kcore

    v, e, _, _ = graph
    cor = {r.entity: r.coreness for r in coreness(v, e, max_k=4).collect()}
    for k in (1, 3):
        members = {r.entity for r in kcore(v, e, k=k).collect()}
        assert members == {x for x, c in cor.items() if c >= k}
