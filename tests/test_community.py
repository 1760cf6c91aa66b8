"""Tests for directed modularity: closed-form identities (single
community → exactly 0; two disconnected cliques → known positive value)
and a pure-python recompute on a random labeled graph."""

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.community import modularity


def _mk(spark, edges, labels):
    e = spark.createDataFrame(edges, "src string, dst string")
    l = spark.createDataFrame(labels, "entity string, label string")
    return e, l


def _python_q(edges, labels):
    lab = dict(labels)
    el = [(lab[s], lab[d]) for s, d in edges if s in lab and d in lab]
    m = float(len(el))
    w = sum(1.0 for s, d in el if s == d)
    dout, din = {}, {}
    for s, d in el:
        dout[s] = dout.get(s, 0.0) + 1.0
        din[d] = din.get(d, 0.0) + 1.0
    x = sum(dout[c] * din.get(c, 0.0) for c in dout)
    return w / m - x / (m * m)


def test_single_community_is_zero(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    labels = [(v, "one") for v in "abc"]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 1
    assert row.modularity == 0.0


def test_two_cliques(spark):
    edges = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
    ]
    labels = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 2
    # each community: e_c/m = 2/4, (dout·din)/m² = 4/16 → Q = 2·(0.5−0.25)/...
    assert row.modularity == pytest.approx(_python_q(edges, labels), abs=1e-9)
    assert row.modularity == pytest.approx(0.5, abs=1e-9)


def test_matches_python_recompute(spark):
    # deterministic pseudo-random labeled digraph
    verts = [f"v{i}" for i in range(30)]
    edges = [
        (verts[(7 * i) % 30], verts[(11 * i + 3) % 30])
        for i in range(120)
        if (7 * i) % 30 != (11 * i + 3) % 30
    ]
    edges = sorted(set(edges))
    labels = [(v, f"c{i % 4}") for i, v in enumerate(verts)]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 4
    assert row.modularity == pytest.approx(
        round(_python_q(edges, labels), 8), abs=1e-9
    )


def test_unlabeled_vertices_drop_from_edge_terms(spark):
    edges = [("a", "b"), ("b", "z"), ("z", "a")]
    labels = [("a", "x"), ("b", "x")]  # z unlabeled
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 1
    # only a→b survives the label joins → one within-edge, m=1 → Q=0
    assert row.modularity == 0.0
