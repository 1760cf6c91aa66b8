"""HITS and count-weighted PageRank differential tests vs independent
numpy oracles (1e-12 bar — same contract as the PageRank kernel suite)."""

import pytest

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.hits import hits
from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle

TOL = 1.0e-12


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 150, seed=7).cache()
    rows = [
        r.asDict()
        for r in transcripts.select("conv_id", "turn_idx", "role", "tool").collect()
    ]
    o_edges = oracle.derive_edges(rows)
    o_vertices = oracle.vertices_of(rows, o_edges)
    return transcripts, rows, o_vertices, o_edges


@pytest.mark.parametrize("k", [1, 3, 5])
def test_hits_matches_numpy(graph, k):
    transcripts, rows, o_vertices, o_edges = graph
    vertices, wedges = build_graph(transcripts)
    got = {r.entity: (r.auth, r.hub) for r in hits(vertices, wedges, k=k).collect()}
    want = oracle.hits_dense(o_vertices, o_edges, k=k)
    assert got.keys() == want.keys()
    for v, (a, h) in want.items():
        assert abs(got[v][0] - a) < TOL, f"auth {v}"
        assert abs(got[v][1] - h) < TOL, f"hub {v}"


def test_hits_edgeless_graph_all_zero(spark):
    """No edges → both sums are 0 every half-step; the guard keeps the
    vectors all-zero instead of dividing by zero (nullif in the twin)."""
    vertices = spark.createDataFrame([("a",), ("b",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    rows = hits(vertices, edges, k=2).collect()
    assert {r.entity for r in rows} == {"a", "b"}
    assert all(r.auth == 0.0 and r.hub == 0.0 for r in rows)


def test_hits_rejects_k0(spark):
    vertices = spark.createDataFrame([("a",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        hits(vertices, edges, k=0)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_salsa_matches_numpy(graph, k):
    from pagerank_optimization_spark.operators.salsa import salsa

    transcripts, rows, o_vertices, o_edges = graph
    vertices, wedges = build_graph(transcripts)
    got = {r.entity: (r.auth, r.hub) for r in salsa(vertices, wedges, k=k).collect()}
    want = oracle.salsa_dense(o_vertices, o_edges, k=k)
    assert got.keys() == want.keys()
    for v, (a, h) in want.items():
        assert abs(got[v][0] - a) < TOL, f"auth {v}"
        assert abs(got[v][1] - h) < TOL, f"hub {v}"


def test_salsa_differs_from_hits(graph):
    """Sanity: on a Zipf-skewed graph the degree split must actually move
    the ranking relative to raw HITS (else the operator is vacuous)."""
    transcripts, rows, o_vertices, o_edges = graph
    s = oracle.salsa_dense(o_vertices, o_edges, k=5)
    h = oracle.hits_dense(o_vertices, o_edges, k=5)
    assert max(abs(s[v][0] - h[v][0]) for v in s) > 1.0e-6


def test_salsa_edgeless_graph_all_zero(spark):
    from pagerank_optimization_spark.operators.salsa import salsa

    vertices = spark.createDataFrame([("a",), ("b",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    rows = salsa(vertices, edges, k=2).collect()
    assert {r.entity for r in rows} == {"a", "b"}
    assert all(r.auth == 0.0 and r.hub == 0.0 for r in rows)


def test_salsa_rejects_k0(spark):
    from pagerank_optimization_spark.operators.salsa import salsa

    vertices = spark.createDataFrame([("a",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        salsa(vertices, edges, k=0)


@pytest.mark.parametrize("kernel", ["join-agg", "csr-blocks"])
def test_pagerank_weighted_matches_numpy(graph, kernel):
    """Count-weighted (row-stochastic multigraph) PageRank through BOTH
    kernels — the weight column genuinely flows through the CSR float64
    values too, not just the join-agg product."""
    transcripts, rows, o_vertices, o_edges = graph
    vertices, wedges = build_graph(transcripts, edge_weights="count")
    res = pagerank(vertices, wedges, fixed_iters=5, kernel=kernel)
    got = {r.entity: r.pr for r in res.ranks.collect()}
    counts = oracle.derive_edge_counts(rows)
    want = oracle.pagerank_weighted_dense(o_vertices, counts, fixed_iters=5)
    assert got.keys() == want.keys()
    for v, p in want.items():
        assert abs(got[v] - p) < TOL, v


def test_weighted_differs_from_binary(graph):
    """Sanity: on a corpus with repeated interactions the count weighting
    must actually change ranks (else the query is vacuous)."""
    transcripts, rows, o_vertices, o_edges = graph
    counts = oracle.derive_edge_counts(rows)
    assert any(c > 1 for c in counts.values()), "corpus has no repeat interactions"
    w = oracle.pagerank_weighted_dense(o_vertices, counts, fixed_iters=5)
    b = oracle.pagerank_dense(o_vertices, o_edges, fixed_iters=5)
    assert max(abs(w[v] - b[v]) for v in w) > 1.0e-9
