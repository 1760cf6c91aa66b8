"""Maximal matching: validity (vertex-disjoint), maximality (every edge
covered), python round-replay differential, partition-count invariance,
determinism."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.matching import maximal_matching


def _graph(spark, pairs):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )
    vs = sorted({v for p in pairs for v in p})
    vertices = spark.createDataFrame([(v,) for v in vs], "entity string")
    return vertices, edges


def _h48(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _py_matching(pairs, salt="mm", rounds=64):
    pool = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    out = []
    for t in range(rounds):
        if not pool:
            break
        key = {
            e: f"{_h48(f'{salt}:{t}:{e[0]}|{e[1]}'):015d}|{e[0]}|{e[1]}" for e in pool
        }
        vmin = {}
        for e, k in key.items():
            for v in e:
                if v not in vmin or k < vmin[v]:
                    vmin[v] = k
        sel = [e for e, k in key.items() if vmin[e[0]] == k and vmin[e[1]] == k]
        out += [(a, b, t) for a, b in sel]
        gone = {v for e in sel for v in e}
        pool = {e for e in pool if e[0] not in gone and e[1] not in gone}
    assert not pool
    return set(out)


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
    ("e", "f"), ("f", "g"), ("h", "h"), ("g", "e"), ("i", "j"),
    ("j", "k"), ("k", "l"), ("l", "i"), ("b", "e"), ("d", "i"),
]


def test_matches_python_replay(spark):
    vertices, edges = _graph(spark, PAIRS)
    got = {(r["a"], r["b"], r["round"]) for r in maximal_matching(vertices, edges).collect()}
    assert got == _py_matching(PAIRS)


def test_validity_and_maximality(spark):
    vertices, edges = _graph(spark, PAIRS)
    rows = maximal_matching(vertices, edges).collect()
    seen = [v for r in rows for v in (r["a"], r["b"])]
    assert len(seen) == len(set(seen))  # vertex-disjoint
    matched = set(seen)
    for a, b in PAIRS:
        if a != b:
            assert a in matched or b in matched, f"uncovered edge {(a, b)}"


def test_partition_invariance_and_determinism(spark):
    vertices, edges = _graph(spark, PAIRS)
    r2 = {tuple(r) for r in maximal_matching(vertices, edges, partitions=2).collect()}
    r8 = {tuple(r) for r in maximal_matching(vertices, edges, partitions=8).collect()}
    again = {tuple(r) for r in maximal_matching(vertices, edges, partitions=8).collect()}
    assert r2 == r8 == again


def test_empty_and_loop_only(spark):
    vertices, edges = _graph(spark, [("x", "x")])
    assert maximal_matching(vertices, edges).count() == 0
