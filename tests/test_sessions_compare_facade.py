"""Sessionization vs python oracle, rank-vector comparator semantics, and
the LinkGraph facade."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.graph import LinkGraph
from pagerank_optimization_spark.operators.compare import compare_rank_vectors
from pagerank_optimization_spark.operators.sessions import session_stats, sessionize
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()


def test_sessionize_matches_python(events):
    got = {r.event_id: (r.session_seq, r.session_id) for r in sessionize(events, gap_seconds=1800).collect()}
    rows = sorted(events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, evs in by_user.items():
        seq = 0
        prev = None
        for r in evs:
            t = r.ts.timestamp()
            if prev is None or t - prev > 1800:
                seq += 1
            prev = t
            assert got[r.event_id] == (seq, f"{uid}-{seq}"), r.event_id


def test_session_stats_consistency(events):
    stats = session_stats(events, gap_seconds=1800).collect()
    assert sum(r.n_events for r in stats) == events.count()
    assert all(r.duration_s >= 0 for r in stats)
    total = sum(r.total_value for r in stats)
    want = events.agg(F.sum("value")).collect()[0][0]
    assert abs(total - want) < 1e-3


def test_compare_rank_vectors(spark):
    a = spark.createDataFrame([("x", 1.0), ("y", 2.0), ("z", 0.5)], "entity string, pr double")
    b = spark.createDataFrame([("x", 1.0), ("y", 2.2), ("w", 9.0)], "entity string, pr double")
    m = compare_rank_vectors(a, b)
    assert abs(m["max_rel_diff"] - 2 * 0.2 / 4.2) < 1e-12
    assert m["n_missing"] == 2  # z and w
    assert abs(m["linf"] - 9.0) < 1e-12  # missing side coalesces to 0
    # identical vectors → all zeros
    z = compare_rank_vectors(a, a)
    assert z["max_rel_diff"] == 0.0 and z["l1"] == 0.0 and z["n_missing"] == 0


def test_linkgraph_facade(spark):
    tr = synthesize_transcripts(spark, 60, seed=2)
    g = LinkGraph.from_transcripts(tr).cache()
    res = g.pagerank(fixed_iters=3, partitions=4)
    assert res.iterations == 3
    assert abs(res.ranks.agg(F.sum("pr")).collect()[0][0] - 1.0) < 1e-9
    comps = g.connected_components()
    assert comps.count() == g.vertices.count()
    assert g.triangle_count() >= 0
    degs = g.degrees()
    assert degs.count() > 0
    # from_edges roundtrip: rebuilding from the raw edge list gives the
    # same vertex set restricted to non-isolated vertices
    g2 = LinkGraph.from_edges(g.edges.select("src", "dst"))
    v_no_iso = (
        g.edges.select(F.col("src").alias("entity"))
        .unionByName(g.edges.select(F.col("dst").alias("entity")))
        .distinct()
        .count()
    )
    assert g2.vertices.count() == v_no_iso


def test_conversation_stats_match_python(spark):
    import datetime

    from pagerank_optimization_spark.operators.sessions import conversation_stats
    from pagerank_optimization_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    rows = [
        ("c1", 0, "user", "t", None, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "t", "search", datetime.datetime(2024, 1, 1, 0, 1, 30)),
        ("c1", 2, "user", "t", None, datetime.datetime(2024, 1, 1, 0, 2, 0)),
        ("c1", 3, "assistant", "t", "search", datetime.datetime(2024, 1, 1, 0, 5, 0)),
        ("c1", 4, "assistant", "t", "pay", datetime.datetime(2024, 1, 1, 0, 6, 0)),
        ("c2", 0, "user", "t", None, datetime.datetime(2024, 2, 2, 12, 0, 0)),
    ]
    df = spark.createDataFrame(
        [(c, i, r, f"{c}:{i}", t, ts) for c, i, r, _x, t, ts in rows],
        schema=TRANSCRIPT_SCHEMA,
    )
    got = {r.conv_id: r for r in conversation_stats(df).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_user_turns, c1.n_tool_calls, c1.n_distinct_tools) == (5, 2, 3, 2)
    assert c1.duration_s == 360.0
    c2 = got["c2"]
    assert (c2.n_turns, c2.n_user_turns, c2.n_tool_calls, c2.n_distinct_tools) == (1, 1, 0, 0)
    assert c2.duration_s == 0.0
