"""Regression guard for the superstep plan-shape invariant: per-superstep
cost must stay ~constant with iteration count. A plan that joins the
checkpointed state df directly alongside an aggregate derived from it makes
Spark's self-join deduplication re-expand the truncated lineage — cost then
compounds ~2× per superstep and a 30-iteration run takes minutes instead of
seconds (observed before the fix; see the NOTE in operators.pagerank)."""

import numpy as np

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts


def test_per_superstep_cost_constant(spark):
    transcripts = synthesize_transcripts(spark, 120, seed=42).cache()
    vertices, wedges = build_graph(transcripts)
    res = pagerank(vertices.cache(), wedges.cache(), fixed_iters=30, partitions=8)
    ms = [m["wall_ms"] for m in res.metrics]
    head = np.median(ms[5:12])  # skip warmup supersteps
    tail = np.median(ms[-6:])
    # exponential lineage re-expansion compounds ~2×/superstep — by
    # superstep 30 the tail/head ratio exceeds 100×. A 10× bound is immune
    # to GC/scheduler noise on a shared test session while still decisive.
    assert tail < 10 * head, f"superstep cost grew: head={head:.0f}ms tail={tail:.0f}ms"
