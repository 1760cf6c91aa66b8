"""Graph coloring by iterated Luby MIS: proper+total invariants, python
class-replay differential (composing the test_mis replay per residual
graph), greedy class structure (class 0 is the full-graph MIS), and
partition invariance."""

import hashlib

from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.coloring import luby_coloring


def _vertices(spark, names):
    return spark.createDataFrame([(n,) for n in names], "entity string")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


def _h48(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)


def _py_mis_members(names, pairs, salt):
    adj = {n: set() for n in names}
    for a, b in pairs:
        if a != b and a in adj and b in adj:
            adj[a].add(b)
            adj[b].add(a)
    undecided = set(names)
    members = set()
    t = 0
    while undecided:
        key = {v: f"{_h48(f'{salt}:{t}:{v}'):015d}|{v}" for v in undecided}
        sel = {
            v
            for v in undecided
            if all(key[v] < key[u] for u in adj[v] if u in undecided)
        }
        members |= sel
        knocked = {u for v in sel for u in adj[v] if u in undecided} - sel
        undecided -= sel | knocked
        t += 1
        assert t < 64
    return members


def _py_coloring(names, pairs, salt="col"):
    remaining = set(names)
    live = [(a, b) for a, b in pairs if a != b]
    out = {}
    c = 0
    while remaining:
        mem = _py_mis_members(
            sorted(remaining),
            [(a, b) for a, b in live if a in remaining and b in remaining],
            f"{salt}:{c}",
        )
        for v in mem:
            out[v] = c
        remaining -= mem
        c += 1
        assert c < 64
    return out


NAMES = list("abcdefghij")
PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
    ("e", "f"), ("f", "d"), ("g", "a"), ("g", "d"), ("h", "h"),
    ("i", "j"), ("j", "g"), ("b", "e"),
]


def test_matches_python_replay(spark):
    rows = luby_coloring(_vertices(spark, NAMES), _edges(spark, PAIRS)).collect()
    got = {r["entity"]: r["color"] for r in rows}
    assert got == _py_coloring(NAMES, PAIRS)


def test_proper_and_total(spark):
    rows = luby_coloring(_vertices(spark, NAMES), _edges(spark, PAIRS)).collect()
    col = {r["entity"]: r["color"] for r in rows}
    assert set(col) == set(NAMES)  # total
    for a, b in PAIRS:
        if a != b:
            assert col[a] != col[b], f"edge {(a, b)} monochromatic"


def test_class0_is_full_graph_mis(spark):
    from pagerank_optimization_spark.operators.mis import maximal_independent_set

    v, e = _vertices(spark, NAMES), _edges(spark, PAIRS)
    c0 = {
        r["entity"]
        for r in luby_coloring(v, e).collect()
        if r["color"] == 0
    }
    mis = {
        r["entity"]
        for r in maximal_independent_set(v, e, salt="col:0").collect()
        if r["in_mis"]
    }
    assert c0 == mis


def test_partition_invariance(spark):
    v, e = _vertices(spark, NAMES), _edges(spark, PAIRS)
    r2 = {tuple(r) for r in luby_coloring(v, e, partitions=2).collect()}
    r8 = {tuple(r) for r in luby_coloring(v, e, partitions=8).collect()}
    assert r2 == r8
