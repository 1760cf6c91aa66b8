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


def test_chunk_documents_is_scan_side_only(docs):
    from pagerank_optimization_spark.operators.sampling import chunk_documents

    plan = physical_plan(chunk_documents(docs, chunk_tokens=64, overlap=8))
    assert "Exchange" not in plan, "chunking must compose with the scan"
    assert "Python" not in plan, "chunking must stay JVM-side"


def test_quantize_embeddings_is_scan_side_only(spark):
    from pagerank_optimization_spark.operators.vectorize import quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    plan = physical_plan(quantize_embeddings(emb))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pmi_pairs_no_python_and_partial_agg(docs):
    from pagerank_optimization_spark.operators.cooccur import pmi_pairs

    df = pmi_pairs(docs, window=2, min_count=5)
    plan = physical_plan(df)
    assert "Python" not in plan, "PMI must be pure array algebra + aggs"
    assert_partial_aggregation(df)


def test_lm_scores_no_python_and_partial_agg(docs):
    from pagerank_optimization_spark.operators.lm import unigram_lm_scores

    df = unigram_lm_scores(docs, k=0.5)
    plan = physical_plan(df)
    assert "Python" not in plan
    assert_partial_aggregation(df)


def test_burst_counts_partial_agg_and_no_window_fn(spark):
    from pagerank_optimization_spark.operators.bursts import event_bursts

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    df = event_bursts(events, bucket_s=3600, z_threshold=2.0)
    plan = physical_plan(df)
    assert "Window" not in plan, "bursts must use aggs, not window functions"
    assert "Python" not in plan
    assert_partial_aggregation(df)


def test_corpus_profile_sketch_path_has_partial_agg(docs):
    from pagerank_optimization_spark.operators.quality import corpus_profile

    # the 100 TB path: approx_percentile is map-side combinable;
    # the exact path intentionally is not (oracle mode only)
    assert_partial_aggregation(corpus_profile(docs, exact=False))


def test_mix_weights_partial_agg(docs):
    from pagerank_optimization_spark.operators.sampling import source_mix_weights

    df = source_mix_weights(docs, alpha=0.7)
    assert "Python" not in physical_plan(df)
    assert_partial_aggregation(df)


def test_salsa_half_step_partial_agg_no_funnel(spark):
    """The SALSA gather is the PageRank contribution-sum shape: the
    degree-split σ·w sum must partially aggregate (in-degree hubs collapse
    map-side) and the loop must never compile a single-partition funnel."""
    from pagerank_optimization_spark.operators.salsa import salsa

    v = spark.createDataFrame([("a",), ("b",), ("c",)], "entity string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    out = salsa(v, e, k=1, partitions=4)
    plan = physical_plan(out)
    assert "Exchange SinglePartition" not in plan


def test_betweenness_forward_level_partial_agg(spark):
    """The forward σ-sum groupBy((s,v)) must have a map-side partial phase
    — that combine is what absorbs in-degree hubs when all pivots advance
    together — and the final plan must not funnel to one partition."""
    from pagerank_optimization_spark.operators.betweenness import betweenness

    v = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "entity string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], "src string, dst string"
    )
    out = betweenness(v, e, sources=["a", "b"], max_depth=3, partitions=4)
    plan = physical_plan(out)
    assert "Exchange SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 2


def test_tool_paths_uses_takeordered_and_partial_agg(spark):
    from pagerank_optimization_spark.operators.sessions import tool_paths

    t = spark.createDataFrame(
        [("c1", 0, "assistant", "a"), ("c1", 1, "assistant", "b"),
         ("c1", 2, "assistant", "c")],
        "conv_id string, turn_idx int, role string, tool string",
    )
    df = tool_paths(t, length=3, top_n=10)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, "top-N must never be a global sort"
    assert_partial_aggregation(df)


def test_source_divergence_partial_agg_and_broadcast_marginals(docs):
    from pagerank_optimization_spark.operators.quality import source_divergence

    df = source_divergence(docs)
    plan = physical_plan(df)
    assert_partial_aggregation(df)
    assert "Broadcast" in plan, "per-source totals / grand total must broadcast"
    assert "Python" not in plan, "JSD must stay JVM-side"


def test_conductance_partial_agg_absorbs_hot_label(spark):
    from pagerank_optimization_spark.operators.community import conductance

    # JVM-side sources (spark.range) so the no-Python assertion sees only
    # the operator's plan, not createDataFrame's applySchemaToPythonRDD
    e = spark.range(8).selectExpr(
        "cast(id as string) AS src", "cast(id + 1 as string) AS dst"
    )
    l = spark.range(9).selectExpr(
        "cast(id as string) AS entity", "cast(id % 2 as string) AS label"
    )
    df = conductance(e, l)
    assert_partial_aggregation(df)
    assert "Python" not in physical_plan(df)


def test_zipf_fit_rides_takeordered(docs):
    from pagerank_optimization_spark.operators.vocab import zipf_fit

    plan = physical_plan(zipf_fit(docs, top_n=100))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
