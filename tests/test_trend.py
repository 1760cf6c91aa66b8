"""Temporal PageRank delta vs a pure-python twin: the split, both graph
derivations, and both rank vectors are rebuilt in python (numpy PageRank
oracle per half), so the test checks the midpoint rule, the per-half
reply-adjacency semantics, and the outer-join/coalesce contract."""

import pytest

from pagerank_optimization_spark.operators.trend import pagerank_delta
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthesize_transcripts(spark, 150, seed=7).cache()


def test_pagerank_delta_matches_python(spark, transcripts):
    rows = [
        r.asDict()
        for r in transcripts.select("conv_id", "turn_idx", "role", "tool", "ts").collect()
    ]
    epochs = [r["ts"].timestamp() for r in rows]
    lo, hi = min(epochs), max(epochs)
    early = [r for r in rows if r["ts"].timestamp() * 2 <= lo + hi]
    late = [r for r in rows if r["ts"].timestamp() * 2 > lo + hi]
    assert early and late, "degenerate split — vacuous test corpus"

    want = {}
    halves = []
    for part in (early, late):
        part = sorted(part, key=lambda r: (r["conv_id"], r["turn_idx"]))
        o_edges = oracle.derive_edges(part)
        o_vertices = oracle.vertices_of(part, o_edges)
        halves.append(oracle.pagerank_dense(o_vertices, o_edges, fixed_iters=5))
    for ent in set(halves[0]) | set(halves[1]):
        pa, pb = halves[0].get(ent, 0.0), halves[1].get(ent, 0.0)
        want[ent] = (round(pa, 8), round(pb, 8), round(pb - pa, 8))

    got = {
        r.entity: (r.pr_early, r.pr_late, r.delta)
        for r in pagerank_delta(transcripts, k0=5).collect()
    }
    assert got.keys() == want.keys()
    for ent, (pa, pb, d) in want.items():
        assert abs(got[ent][0] - pa) < 1.0e-9, ent
        assert abs(got[ent][1] - pb) < 1.0e-9, ent
        assert abs(got[ent][2] - d) < 1.0e-9, ent


def test_pagerank_delta_each_half_sums_to_one(spark, transcripts):
    from pyspark.sql import functions as F

    sums = pagerank_delta(transcripts, k0=3).agg(
        F.sum("pr_early"), F.sum("pr_late")
    ).collect()[0]
    assert abs(sums[0] - 1.0) < 1.0e-6
    assert abs(sums[1] - 1.0) < 1.0e-6


def test_pagerank_delta_rejects_bad_k0(spark, transcripts):
    with pytest.raises(ValueError):
        pagerank_delta(transcripts, k0=0)
