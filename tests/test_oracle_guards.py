"""DuckDB-only guards on the oracle twins (no SparkSession — these check
the SQL side's own invariants, so a too-shallow unroll or a broken hash
family fails here before it can masquerade as an engine bug in the
driver's compare)."""

import duckdb
import pytest

from pagerank_optimization_spark.plans.oracle_sql_docs import docs_dedup_cascade_sql

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def test_cascade_oracle_converges_at_default_depth(con):
    """The cc_rounds=24 unroll must have converged on the test corpus: the
    in-SQL sentinel (doc_id = -1 when round 24 still changed labels) must
    be absent, and the survivor set must be a proper subset of the corpus."""
    rows = con.sql(docs_dedup_cascade_sql()).df()
    total = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert (rows["doc_id"] == -1).sum() == 0
    assert 0 < len(rows) < total


def test_cascade_oracle_sentinel_fires_when_unroll_too_shallow(con):
    """With cc_rounds=2 the sentinel machinery itself is exercised: either
    the tiny unroll already converged on this corpus (no sentinel — then
    the survivor sets must agree with the default depth), or it did not
    and the -1 row must appear. Both outcomes prove the guard is live; a
    silent wrong-answer (different survivors, no sentinel) is the failure
    mode the guard exists to prevent."""
    shallow = con.sql(docs_dedup_cascade_sql(cc_rounds=2)).df()
    deep = con.sql(docs_dedup_cascade_sql()).df()
    if (shallow["doc_id"] == -1).sum() == 0:
        assert sorted(shallow["doc_id"]) == sorted(deep["doc_id"])
    else:
        assert (shallow["doc_id"] == -1).sum() == 1


EVENTS = "/root/testdata/sf0.01/events.parquet"


@pytest.fixture(scope="module")
def graph_con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
    return c


def test_kcore_oracle_converges_at_default_depth(graph_con):
    """The rounds=16 peeling unroll must have converged on the test graph:
    the '!kcore-not-converged' sentinel row must be absent."""
    from pagerank_optimization_spark.plans.oracle_sql import kcore_query_sql

    rows = graph_con.sql(kcore_query_sql(k=3, rounds=16)).df()
    assert (rows["entity"] == "!kcore-not-converged").sum() == 0
    assert len(rows) > 0


def test_kcore_oracle_sentinel_fires_when_unroll_too_shallow(graph_con):
    """With rounds=1 either peeling already converged (then the core must
    equal the deep unroll's) or the sentinel row must appear — a silent
    under-peel is the failure mode the sentinel exists to prevent."""
    from pagerank_optimization_spark.plans.oracle_sql import kcore_query_sql

    shallow = graph_con.sql(kcore_query_sql(k=3, rounds=1)).df()
    deep = graph_con.sql(kcore_query_sql(k=3, rounds=16)).df()
    if (shallow["entity"] == "!kcore-not-converged").sum() == 0:
        assert sorted(shallow["entity"]) == sorted(deep["entity"])
    else:
        assert (shallow["entity"] == "!kcore-not-converged").sum() == 1
