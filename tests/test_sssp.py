"""Weighted shortest-path differential tests vs the independent Python
Bellman-Ford oracle (exact integer equality — the cnt edge weights keep
distances in the long domain)."""

import pytest

from pagerank_optimization_spark.operators.bfs import bfs_distances
from pagerank_optimization_spark.operators.graph_build import (
    build_graph,
    edge_multiplicities,
)
from pagerank_optimization_spark.operators.sssp import sssp_distances
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 150, seed=7).cache()
    vertices, _ = build_graph(transcripts)
    wedges = edge_multiplicities(transcripts)
    vertices, wedges = vertices.cache(), wedges.cache()
    rows = [
        r.asDict()
        for r in transcripts.select("conv_id", "turn_idx", "role", "tool").collect()
    ]
    o_counts = oracle.derive_edge_counts(rows)
    return vertices, wedges, o_counts


def _seeds(vertices):
    return vertices.filter(F.col("entity").startswith("conv:conv-1"))


def test_sssp_exact_full(graph):
    vertices, wedges, o_counts = graph
    seeds = _seeds(vertices)
    seed_set = {r.entity for r in seeds.collect()}
    got = {
        r.entity: r.dist
        for r in sssp_distances(vertices, wedges, seeds, weight_col="cnt").collect()
    }
    assert got == oracle.sssp_distances(o_counts, seed_set)


@pytest.mark.parametrize("rounds", [1, 2, 4])
def test_sssp_fixed_rounds_matches_full_relaxation(graph, rounds):
    """Delta-frontier relaxation must equal FULL per-round Bellman-Ford
    after any fixed round count — the equivalence the SQL twin rides on."""
    vertices, wedges, o_counts = graph
    seeds = _seeds(vertices)
    seed_set = {r.entity for r in seeds.collect()}
    got = {
        r.entity: r.dist
        for r in sssp_distances(
            vertices, wedges, seeds, weight_col="cnt", fixed_rounds=rounds
        ).collect()
    }
    assert got == oracle.sssp_distances(o_counts, seed_set, rounds=rounds)


def test_sssp_unit_weights_equals_bfs(graph):
    """With every weight forced to 1, shortest path cost == hop count."""
    vertices, wedges, _ = graph
    seeds = _seeds(vertices)
    unit = wedges.withColumn("cnt", F.lit(1).cast("long"))
    got = {
        r.entity: r.dist
        for r in sssp_distances(vertices, unit, seeds, weight_col="cnt").collect()
    }
    want = {
        r.entity: r.dist
        for r in bfs_distances(
            vertices, wedges.select("src", "dst"), seeds
        ).collect()
    }
    assert got == want


def test_sssp_cheap_long_path_beats_heavy_direct(spark):
    """a→b cost 10 vs a→c→d→b cost 3: the longer-hop path must win —
    the case hop-count BFS gets wrong by construction."""
    vertices = spark.createDataFrame([(v,) for v in "abcd"], "entity string")
    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "d", 1), ("d", "b", 1)],
        "src string, dst string, cnt long",
    )
    seeds = spark.createDataFrame([("a",)], "entity string")
    got = {
        r.entity: r.dist
        for r in sssp_distances(vertices, edges, seeds, weight_col="cnt").collect()
    }
    assert got == {"a": 0, "b": 3, "c": 1, "d": 2}
    # truncated at 1 round the direct edge is all there is
    got1 = {
        r.entity: r.dist
        for r in sssp_distances(
            vertices, edges, seeds, weight_col="cnt", fixed_rounds=1
        ).collect()
    }
    assert got1 == {"a": 0, "b": 10, "c": 1}


def test_sssp_negative_weight_raises(spark):
    vertices = spark.createDataFrame([("a",), ("b",)], "entity string")
    edges = spark.createDataFrame([("a", "b", -1)], "src string, dst string, cnt long")
    seeds = spark.createDataFrame([("a",)], "entity string")
    with pytest.raises(ValueError, match="negative"):
        sssp_distances(vertices, edges, seeds, weight_col="cnt")
