"""Katz centrality differential tests vs an independent numpy oracle
(1e-12 bar — same contract as the PageRank/HITS/SALSA suites)."""

import pytest

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.katz import katz
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
    return transcripts, o_vertices, o_edges


@pytest.mark.parametrize("k,alpha", [(1, 0.05), (3, 0.05), (5, 0.1)])
def test_katz_matches_numpy(graph, k, alpha):
    transcripts, o_vertices, o_edges = graph
    vertices, edges = build_graph(transcripts)
    got = {r.entity: r.katz for r in katz(vertices, edges, k=k, alpha=alpha).collect()}
    want = oracle.katz_dense(o_vertices, o_edges, k=k, alpha=alpha)
    assert got.keys() == want.keys()
    for v, x in want.items():
        assert abs(got[v] - x) < TOL, v


def test_katz_beta_is_noop_after_normalization(graph):
    """Normalization divides β out, so any β > 0 gives identical scores —
    the documented contract."""
    transcripts, _, _ = graph
    vertices, edges = build_graph(transcripts)
    a = {r.entity: r.katz for r in katz(vertices, edges, k=3, beta=1.0).collect()}
    b = {r.entity: r.katz for r in katz(vertices, edges, k=3, beta=7.5).collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert abs(a[v] - b[v]) < TOL, v


def test_katz_edgeless_graph_is_uniform(spark):
    """No edges → every vertex holds the bare β term → uniform 1/n."""
    vertices = spark.createDataFrame([("a",), ("b",), ("c",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    rows = katz(vertices, edges, k=2).collect()
    assert {r.entity for r in rows} == {"a", "b", "c"}
    for r in rows:
        assert abs(r.katz - 1.0 / 3.0) < TOL


def test_katz_rejects_bad_args(spark):
    vertices = spark.createDataFrame([("a",)], "entity string")
    edges = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        katz(vertices, edges, k=0)
    with pytest.raises(ValueError):
        katz(vertices, edges, alpha=0.0)
    with pytest.raises(ValueError):
        katz(vertices, edges, alpha=1.0)
    with pytest.raises(ValueError):
        katz(vertices, edges, beta=0.0)
