"""Luby MIS: independence + maximality invariants, python round-replay
differential (same deterministic priorities), isolated vertices, and
determinism across partition counts."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.mis import maximal_independent_set


def _vertices(spark, names):
    return spark.createDataFrame([(n,) for n in names], "entity string")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def _h48(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)


def _key(t: int, v: str, salt: str = "mis") -> str:
    return f"{_h48(f'{salt}:{t}:{v}'):015d}|{v}"


def _python_mis(names, pairs, salt="mis"):
    """Independent replay of the same Luby rounds in plain python."""
    nbrs = {n: set() for n in names}
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    undecided = set(names)
    out = {}
    t = 0
    while undecided:
        sel = {
            v
            for v in undecided
            if all(
                _key(t, v, salt) < _key(t, u, salt)
                for u in nbrs[v] & undecided
            )
        }
        kn = {u for v in sel for u in nbrs[v] & undecided} - sel
        for v in sel:
            out[v] = (True, t)
        for v in kn:
            out[v] = (False, t)
        undecided -= sel | kn
        t += 1
        assert t < 64
    return out


def _check_invariants(rows, pairs):
    in_mis = {r["entity"] for r in rows if r["in_mis"]}
    others = {r["entity"] for r in rows if not r["in_mis"]}
    nbrs = {}
    for a, b in pairs:
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    # independence: no edge inside the set
    for a, b in pairs:
        assert not (a in in_mis and b in in_mis and a != b)
    # maximality: every non-member has a member neighbor
    for v in others:
        assert nbrs.get(v, set()) & in_mis, v


def test_triangle_and_path(spark):
    for names, pairs in (
        (list("abc"), [("a", "b"), ("b", "c"), ("c", "a")]),
        (list("abcde"), [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]),
    ):
        rows = maximal_independent_set(
            _vertices(spark, names), _edges(spark, pairs)
        ).collect()
        assert {r["entity"] for r in rows} == set(names)
        _check_invariants(rows, pairs)
        want = _python_mis(names, pairs)
        assert {r["entity"]: (r["in_mis"], r["round"]) for r in rows} == want


def test_isolated_vertices_all_join_round0(spark):
    rows = maximal_independent_set(
        _vertices(spark, ["x", "y", "z"]), _edges(spark, [])
    ).collect()
    assert all(r["in_mis"] and r["round"] == 0 for r in rows)
    assert len(rows) == 3


def test_star_hub(spark):
    # star: either the hub alone, or all leaves — whichever, invariants hold
    names = ["h"] + [f"l{i}" for i in range(10)]
    pairs = [("h", f"l{i}") for i in range(10)]
    rows = maximal_independent_set(_vertices(spark, names), _edges(spark, pairs)).collect()
    _check_invariants(rows, pairs)
    assert {r["entity"]: (r["in_mis"], r["round"]) for r in rows} == _python_mis(
        names, pairs
    )


def test_transcript_graph_differential_and_partition_invariance(spark):
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    vertices, edges = build_graph(synthesize_transcripts(spark, 120, seed=13))
    names = [r["entity"] for r in vertices.collect()]
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    want = _python_mis(names, pairs)
    for p in (2, 7):
        rows = maximal_independent_set(vertices, edges, partitions=p).collect()
        assert {r["entity"]: (r["in_mis"], r["round"]) for r in rows} == want
        _check_invariants(rows, pairs)


def test_max_rounds_raises(spark):
    with pytest.raises(RuntimeError, match="undecided"):
        maximal_independent_set(
            _vertices(spark, list("ab")),
            _edges(spark, [("a", "b")]),
            max_rounds=0,
        )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_driver_query_matches_duckdb_twin(spark, sf_dir):
    import duckdb

    import __spark_entry__ as entry
    from pagerank_optimization_spark.plans import oracle_sql as osql

    got = {
        r["entity"]: (r["in_mis"], r["round"])
        for r in entry.queries()["graph_mis"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        e: (im, rd)
        for e, im, rd in con.sql(osql.mis_query_sql(rounds=12)).fetchall()
    }
    assert "!mis-not-converged" not in want
    assert got == want
