"""Tests for deterministic hash-seeded random walks: a pure-python
replay of the MD5 choice rule on a hand-built graph, layout equivalence
(array ≡ expand), partition invariance, multi-walk fan-out, and dangling
termination."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.walks import random_walks
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("a", "d"),
    ("b", "a"),
    ("b", "c"),
    ("c", "a"),
    # d is dangling (no out-edges)
]
VERTS = ["a", "b", "c", "d"]


@pytest.fixture(scope="module")
def graph(spark):
    v = spark.createDataFrame([(x,) for x in VERTS], "entity string")
    e = spark.createDataFrame(EDGES, "src string, dst string")
    return v.cache(), e.cache()


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _python_walks(length, salt="walk", wpn=1):
    adj = {}
    for s, d in EDGES:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    rows = set()
    for v in VERTS:
        for j in range(wpn):
            wid = f"{v}#{j}"
            cur = v
            rows.add((wid, 0, cur))
            for t in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h48(f"{salt}:{wid}:{t}") % len(nbrs)]
                rows.add((wid, t, cur))
    return rows


def test_walks_match_python_replay(graph):
    v, e = graph
    got = {
        (r.walk_id, r.step, r.entity)
        for r in random_walks(v, e, 5).collect()
    }
    assert got == _python_walks(5)


def test_layouts_agree(graph):
    v, e = graph
    a = sorted(
        map(tuple, random_walks(v, e, 4, layout="array").collect())
    )
    x = sorted(
        map(tuple, random_walks(v, e, 4, layout="expand").collect())
    )
    assert a == x


def test_partition_invariance(graph):
    v, e = graph
    one = sorted(map(tuple, random_walks(v, e, 3, partitions=1).collect()))
    many = sorted(
        map(
            tuple,
            random_walks(
                v.repartition(7), e.repartition(5), 3, partitions=13
            ).collect(),
        )
    )
    assert one == many


def test_walks_per_vertex_fanout(graph):
    v, e = graph
    out = random_walks(v, e, 2, walks_per_vertex=3)
    starts = out.filter(F.col("step") == 0)
    assert starts.count() == len(VERTS) * 3
    assert {
        (r.walk_id, r.step, r.entity) for r in out.collect()
    } == _python_walks(2, wpn=3)


def test_dangling_terminates(graph):
    v, e = graph
    out = random_walks(v, e, 6)
    d_rows = out.filter(F.col("walk_id") == "d#0").collect()
    assert [(r.step, r.entity) for r in d_rows] == [(0, "d")]


def test_salt_changes_walks(graph):
    v, e = graph
    a = {tuple(r) for r in random_walks(v, e, 4, salt="walk").collect()}
    b = {tuple(r) for r in random_walks(v, e, 4, salt="other").collect()}
    assert a != b  # 3-way branching over 4 steps: collision ~impossible


def test_validation(graph):
    v, e = graph
    with pytest.raises(ValueError):
        random_walks(v, e, -1)
    with pytest.raises(ValueError):
        random_walks(v, e, 2, walks_per_vertex=0)
    with pytest.raises(ValueError):
        random_walks(v, e, 2, layout="nope")


def test_skipgram_pairs_match_python_recount(spark):
    """skipgram_pairs vs a python recount over the SAME walk corpus."""
    from collections import Counter

    from pagerank_optimization_spark.operators.walks import random_walks, skipgram_pairs

    t = synthesize_transcripts(spark, 40, seed=7)
    vertices, edges = build_graph(t)
    walks = random_walks(vertices, edges, 3)
    rows = walks.collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.entity
    window = 2
    want = Counter()
    for steps in by_walk.values():
        for i, x in steps.items():
            for d in range(1, window + 1):
                y = steps.get(i + d)
                if y is not None:
                    want[(x, y)] += 1
                    want[(y, x)] += 1
    got = {(r.center, r.context): r.pair_count
           for r in skipgram_pairs(walks, window=window).collect()}
    assert got == dict(want)
    assert len(got) > 0


def test_skipgram_rejects_bad_window(spark):
    from pagerank_optimization_spark.operators.walks import skipgram_pairs

    df = spark.createDataFrame([("a#0", 0, "a")], "walk_id string, step int, entity string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skipgram_pairs(df, window=0)
