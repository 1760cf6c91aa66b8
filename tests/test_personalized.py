"""Personalized PageRank (reset distribution) vs numpy oracle, and the
count-weighted multigraph build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 100, seed=21).cache()
    vertices, wedges = build_graph(transcripts)
    rows = [r.asDict() for r in transcripts.select("conv_id", "turn_idx", "role", "tool").collect()]
    o_edges = oracle.derive_edges(rows)
    o_vertices = oracle.vertices_of(rows, o_edges)
    return vertices.cache(), wedges.cache(), o_vertices, o_edges, transcripts


@pytest.mark.parametrize("kernel", ["join-agg", "csr-blocks"])
def test_personalized_matches_numpy(spark, graph, kernel):
    """Feature-uniform kernel dispatch (the reference runs every variant
    through the same rig, build_test_rig.sh:37-48): personalized reset must
    hold on BOTH kernels against the numpy oracle."""
    vertices, wedges, o_vertices, o_edges, _ = graph
    # teleport onto the agent entities only, skewed
    agents = sorted(v for v in o_vertices if v.startswith("agent:"))
    reset_py = {a: float(i + 1) for i, a in enumerate(agents)}
    reset_df = spark.createDataFrame(list(reset_py.items()), "entity string, weight double")

    res = pagerank(
        vertices, wedges, tol=1e-10, max_iter=200, reset=reset_df, partitions=8, kernel=kernel
    )
    got = {r[0]: r[1] for r in res.ranks.collect()}
    want = oracle.pagerank_dense(o_vertices, o_edges, tol=1e-10, max_iter=200, reset=reset_py)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-9)
    # mass conserved; non-reset-reachable dangling-teleport keeps agents hot
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # personalization bites: agent mass exceeds uniform-pagerank agent mass
    plain = {r[0]: r[1] for r in pagerank(vertices, wedges, tol=1e-10, max_iter=200, partitions=8).ranks.collect()}
    assert sum(got[a] for a in agents) > sum(plain[a] for a in agents)


def test_personalized_rejects_bad_reset(spark, graph):
    vertices, wedges, *_ = graph
    empty = spark.createDataFrame([], "entity string, weight double")
    with pytest.raises(ValueError):
        pagerank(vertices, wedges, fixed_iters=2, reset=empty, partitions=4)
    ghost = spark.createDataFrame([("tool:doesnotexist", 1.0)], "entity string, weight double")
    with pytest.raises(ValueError):
        pagerank(vertices, wedges, fixed_iters=2, reset=ghost, partitions=4)
    # weights on unknown ids are dropped + renormalized, not fatal
    mixed = spark.createDataFrame(
        [("tool:doesnotexist", 5.0), ("agent:a1", 1.0)], "entity string, weight double"
    )
    res = pagerank(vertices, wedges, fixed_iters=2, reset=mixed, partitions=4)
    assert abs(res.ranks.agg(F.sum("pr")).collect()[0][0] - 1.0) < 1e-9
    # same rejection contract on the csr-blocks kernel (feature-uniform dispatch)
    with pytest.raises(ValueError):
        pagerank(vertices, wedges, fixed_iters=2, reset=ghost, kernel="csr-blocks", partitions=4)


def test_count_weighted_graph(spark, graph):
    *_, transcripts = graph
    vertices, wedges = build_graph(transcripts, edge_weights="count")
    rows = wedges.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, 0.0)
        by_src[r.src] += r.weight
    assert all(abs(s - 1.0) < 1e-9 for s in by_src.values())  # row-stochastic
    # multigraph weights differ from binary on repeated interactions
    _, binary = build_graph(transcripts, edge_weights="binary")
    wb = {(r.src, r.dst): r.weight for r in binary.collect()}
    wc = {(r.src, r.dst): r.weight for r in rows}
    assert set(wb) == set(wc)  # same support
    assert any(abs(wb[k] - wc[k]) > 1e-12 for k in wb)  # different weighting
    # pagerank runs and conserves mass on the weighted graph
    res = pagerank(vertices, wedges, fixed_iters=5, partitions=4)
    assert abs(res.ranks.agg(F.sum("pr")).collect()[0][0] - 1.0) < 1e-9
