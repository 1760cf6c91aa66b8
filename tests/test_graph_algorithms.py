"""CC / LPA / triangle differential tests vs the independent Python oracle
(exact equality — north rule: components/labels exact)."""

import pytest

from pagerank_optimization_spark.operators.components import connected_components
from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.lpa import label_propagation
from pagerank_optimization_spark.operators.triangles import (
    local_triangle_counts,
    triangle_count,
)
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


def test_connected_components_exact(graph):
    vertices, wedges, o_vertices, o_edges = graph
    got = {r.entity: r.component for r in connected_components(vertices, wedges).collect()}
    want = oracle.connected_components(o_vertices, o_edges)
    assert got == want


def test_cc_fixed_rounds_prefix_consistent(graph):
    """Fixed-round mode after enough rounds equals the fixpoint."""
    vertices, wedges, o_vertices, o_edges = graph
    got = {r.entity: r.component for r in connected_components(vertices, wedges, fixed_rounds=16).collect()}
    want = oracle.connected_components(o_vertices, o_edges)
    assert got == want


def test_triangle_count_exact(graph):
    vertices, wedges, o_vertices, o_edges = graph
    want = oracle.triangle_count(o_edges)
    got_lex = triangle_count(wedges, degree_oriented=False).collect()[0][0]
    got_deg = triangle_count(wedges, degree_oriented=True).collect()[0][0]
    assert got_lex == want
    assert got_deg == want  # orientation strategy must not change the count


def test_local_triangle_counts_sum(graph):
    vertices, wedges, o_vertices, o_edges = graph
    per_vertex = local_triangle_counts(wedges).collect()
    total = sum(r.n_triangles for r in per_vertex)
    assert total == 3 * oracle.triangle_count(o_edges)  # each triangle counted at 3 vertices


def test_lpa_deterministic_and_total(graph):
    vertices, wedges, o_vertices, o_edges = graph
    a = {r.entity: r.label for r in label_propagation(vertices, wedges, rounds=5).collect()}
    b = {r.entity: r.label for r in label_propagation(vertices, wedges, rounds=5).collect()}
    assert a == b  # deterministic under re-execution (total tie-break order)
    assert set(a) == set(o_vertices)
    # labels are always existing entities
    assert set(a.values()) <= set(o_vertices)
    # LPA coarsens: fewer labels than vertices on a connected-ish graph
    assert len(set(a.values())) < len(o_vertices)


def test_clustering_coefficients_small(spark):
    from pagerank_optimization_spark.operators.triangles import clustering_coefficients

    # triangle a-b-c plus pendant d attached to a
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], "src string, dst string"
    )
    out = {r.entity: (r.degree, r.n_tri, r.coeff) for r in clustering_coefficients(edges).collect()}
    assert out["b"] == (2, 1, 1.0) and out["c"] == (2, 1, 1.0)
    assert out["a"][0] == 3 and out["a"][1] == 1
    assert abs(out["a"][2] - 1.0 / 3.0) < 1e-8
    assert out["d"] == (1, 0, 0.0)
