"""Plan audits for the round-5 operator additions (the 100× lens the
other families already carry, tests/test_partitioning.py):

- vocab_topk / bpe_pair_counts: top-N must compile to
  TakeOrderedAndProject (per-partition heaps + driver merge), never a
  global Sort over the vocabulary; the frequency aggregates must have a
  partial phase (map-side combine is THE skew defense for hot tokens).
- weighted_hash_sample / redact_pii: pure scan-side codegen — zero
  exchanges, zero Python in the plan.
- random_walks: no single-partition funnel in a step plan.
"""

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.pii import redact_pii
from pagerank_optimization_spark.operators.sampling import weighted_hash_sample
from pagerank_optimization_spark.operators.vocab import bpe_pair_counts, vocab_topk
from pagerank_optimization_spark.plans.partitioning import (
    assert_partial_aggregation,
    physical_plan,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_vocab_topk_uses_takeordered_not_global_sort(docs):
    plan = physical_plan(vocab_topk(docs, 50))
    assert "TakeOrderedAndProject" in plan
    assert_partial_aggregation(vocab_topk(docs, 50))


def test_bpe_pairs_uses_takeordered_not_global_sort(docs):
    plan = physical_plan(bpe_pair_counts(docs, 40))
    assert "TakeOrderedAndProject" in plan
    assert_partial_aggregation(bpe_pair_counts(docs, 40))


def test_weighted_sample_is_scan_side_only(docs):
    df = weighted_hash_sample(docs, F.lit(0.5), "doc_id")
    plan = physical_plan(df)
    assert "Exchange" not in plan, "weighted sample must not shuffle"
    assert "Python" not in plan, "weighted sample must stay JVM-side"


def test_redact_pii_is_scan_side_only(docs):
    plan = physical_plan(redact_pii(docs))
    assert "Exchange" not in plan, "redaction must not shuffle"
    assert "Python" not in plan, "redaction must stay JVM-side"


def test_walk_step_has_no_global_funnel(spark):
    from pagerank_optimization_spark.operators.walks import random_walks

    v = spark.createDataFrame([("a",), ("b",), ("c",)], "entity string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    out = random_walks(v, e, 2, partitions=4)
    plan = physical_plan(out)
    assert "Exchange SinglePartition" not in plan
