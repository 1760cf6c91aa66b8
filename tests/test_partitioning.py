"""Skew-handling equivalence + physical-plan audits."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.graph_build import build_graph, turn_entities
from pagerank_optimization_spark.operators.pagerank import _dangling_of, _iterate, pagerank
from pagerank_optimization_spark.plans.partitioning import (
    assert_broadcast_join,
    assert_column_pruned,
    assert_partial_aggregation,
    salted_pagerank_step,
    with_degree_salt,
)
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 200, seed=13).cache()
    vertices, wedges = build_graph(transcripts)
    return vertices.cache(), wedges.cache()


def test_degree_salting_preserves_pagerank(spark, graph):
    vertices, wedges = graph
    plain = pagerank(vertices, wedges, fixed_iters=5, partitions=8)

    # salted run through the same loop with the salted step (hub threshold
    # tiny so real splitting happens on this fixture)
    salted = with_degree_salt(wedges, max_deg=5).persist()
    assert salted.filter(F.col("salt") > 0).count() > 0  # splitting engaged
    verts = vertices.select("entity").repartition(8, "entity").persist()
    n = verts.count()
    dang = _dangling_of(verts, salted, "entity").persist()
    res = _iterate(
        verts, "entity", salted_pagerank_step(salted), dang, n,
        salted.count(), damping=0.85, tol=1e-6, max_iter=100, fixed_iters=5,
        partitions=8,
    )
    a = {r[0]: r[1] for r in plain.ranks.collect()}
    b = {r[0]: r[1] for r in res.ranks.collect()}
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)


def test_pagerank_hub_split_param(spark, graph):
    """The public hub_split_degree knob gives identical results."""
    vertices, wedges = graph
    plain = pagerank(vertices, wedges, fixed_iters=4, partitions=8)
    split = pagerank(vertices, wedges, fixed_iters=4, partitions=8, hub_split_degree=5)
    a = {r[0]: r[1] for r in plain.ranks.collect()}
    b = {r[0]: r[1] for r in split.ranks.collect()}
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)


def test_salt_cardinality_bounded(graph):
    _, wedges = graph
    salted = with_degree_salt(wedges, max_deg=5)
    stats = (
        salted.groupBy("dst")
        .agg(F.countDistinct("salt").alias("n_salts"), F.count("*").alias("indeg"))
        .collect()
    )
    for r in stats:
        assert r.n_salts <= max(1, -(-r.indeg // 5))  # ≤ ceil(indeg/max_deg)


def test_text_column_pruned_from_graph_scan(spark, tmp_path):
    # write transcripts to parquet, derive entities, check scan schema
    tr = synthesize_transcripts(spark, 50, seed=1)
    p = str(tmp_path / "tr.parquet")
    tr.write.parquet(p)
    turns = turn_entities(spark.read.parquet(p))
    assert_column_pruned(turns, "text")


def test_degree_join_is_broadcast(graph):
    _, wedges = graph
    assert_broadcast_join(wedges)  # normalization join carries the hint


def test_contrib_agg_has_partial_phase(graph):
    vertices, wedges = graph
    ranks = vertices.withColumn("pr", F.lit(0.1))
    contribs = (
        wedges.join(ranks.withColumnRenamed("entity", "src"), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("weight") * F.col("pr")).alias("contrib"))
    )
    assert_partial_aggregation(contribs)
