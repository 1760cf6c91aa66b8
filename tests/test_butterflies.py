"""Butterfly (4-cycle) count: closed-form graphs, a python brute-force
differential on the synthesized transcript graph, and the hub-exclusion
(max_degree) semantics with counters."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.triangles import (
    butterfly_count,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string"
    )


def _python_butterflies(und_pairs):
    """Reference count via the same diagonal-codegree identity, recomputed
    independently: nbr sets per vertex, codeg per unordered pair, Σ C(m,2)/2."""
    nbrs: dict = {}
    for a, b in und_pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    total = 0
    for u, w in combinations(sorted(nbrs), 2):
        m = len(nbrs[u] & nbrs[w])
        total += m * (m - 1) // 2
    assert total % 2 == 0
    return total // 2


def test_single_square(spark):
    row = butterfly_count(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ).collect()[0]
    assert row["n_butterflies"] == 1
    # both diagonals {a,c} and {b,d} have codeg 2
    assert row["n_codeg2_pairs"] == 2


def test_k4_has_three_squares(spark):
    verts = "abcd"
    row = butterfly_count(
        _edges(spark, [(u, v) for u, v in combinations(verts, 2)])
    ).collect()[0]
    assert row["n_butterflies"] == 3


def test_k23_closed_form(spark):
    # complete bipartite K_{2,3}: C(2,2)·C(3,2) = 3 butterflies
    left, right = ["l0", "l1"], ["r0", "r1", "r2"]
    row = butterfly_count(
        _edges(spark, [(u, v) for u in left for v in right])
    ).collect()[0]
    assert row["n_butterflies"] == 3
    # diagonals: 1 left pair (codeg 3) + 3 right pairs (codeg 2)
    assert row["n_codeg2_pairs"] == 4


def test_triangle_and_path_have_none(spark):
    for pairs in (
        [("a", "b"), ("b", "c"), ("c", "a")],
        [("a", "b"), ("b", "c"), ("c", "d")],
    ):
        assert butterfly_count(_edges(spark, pairs)).collect()[0][
            "n_butterflies"
        ] == 0


def test_direction_loops_and_duplicates_ignored(spark):
    # same square expressed with reversed/duplicate edges and a self-loop
    row = butterfly_count(
        _edges(
            spark,
            [("b", "a"), ("a", "b"), ("b", "c"), ("d", "c"), ("d", "a"), ("a", "a")],
        )
    ).collect()[0]
    assert row["n_butterflies"] == 1


def test_python_differential_on_transcript_graph(spark):
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    _, edges = build_graph(synthesize_transcripts(spark, 120, seed=11))
    got = butterfly_count(edges, max_degree=None).collect()[0]["n_butterflies"]
    und = [(r["a"], r["b"]) for r in undirected_edges(edges).collect()]
    assert got == _python_butterflies(und)


def test_hub_exclusion_and_counters(spark):
    # square a-b-c-d plus a hub h wired to every square vertex: the hub
    # adds 3 butterflies (any 2 of the 4 codeg-2 diagonals through h...
    # recompute in python rather than hand-wave)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")] + [
        ("h", v) for v in "abcd"
    ]
    full = _python_butterflies(pairs)
    assert full > 1
    counters: dict = {}
    row = butterfly_count(
        _edges(spark, pairs), max_degree=3, counters=counters
    ).collect()[0]
    # deg(h)=4 > 3 → h excluded; the bare square remains
    assert row["n_butterflies"] == 1
    assert counters == {"hub_vertices_dropped": 1, "hub_edges_dropped": 4}
    # exact mode sees the full count
    exact = butterfly_count(_edges(spark, pairs), max_degree=None).collect()[0]
    assert exact["n_butterflies"] == full


def test_empty_graph(spark):
    row = butterfly_count(
        spark.createDataFrame([], "src string, dst string")
    ).collect()[0]
    assert row["n_butterflies"] == 0 and row["n_codeg2_pairs"] == 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_driver_query_matches_duckdb_twin(spark, sf_dir):
    import duckdb

    import __spark_entry__ as entry
    from pagerank_optimization_spark.plans import oracle_sql as osql

    got = entry.queries()["graph_butterflies"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.sql(osql.butterfly_query_sql(max_degree=1000)).fetchone()
    assert (got["n_butterflies"], got["n_codeg2_pairs"]) == want
