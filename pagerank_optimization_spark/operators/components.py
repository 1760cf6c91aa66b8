"""Weakly connected components — min-label propagation over the same
gather-scatter substrate as PageRank (north_star: CC is a first-class
algorithm of the engine; the reference has no CC, its SpMV loop
tuned_variant_baseline.c:107-148 is the iteration pattern we generalize).

Labels are entity strings; the component label is the lexicographic-min
entity in the component — exact and deterministic (north rule: components
exact, not approximate).

Two modes:
- ``fixed_rounds=k`` — exactly k supersteps (oracle mode: matches an
  unrolled SQL formulation round-for-round even pre-convergence);
- default — iterate until no label changes (fixpoint; exact WCC as long
  as rounds ≥ graph diameter, which the loop guarantees by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: src→dst ∪ dst→src, distinct (a, b) pairs."""
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return fwd.unionByName(rev).distinct()


def _step(labels: DataFrame, sym: DataFrame) -> DataFrame:
    """new_lbl(v) = min(lbl(v), min_{u ~ v} lbl(u)) — a gather (join on the
    neighbor side) + scatter-min (groupBy agg), the CC analog of the SpMV
    gather-scatter (tuned_variant_baseline.c:83-90 with (+,*) → (min,id))."""
    neighbor_min = (
        sym.join(labels.withColumnRenamed("entity", "b"), "b", "inner")
        .groupBy(F.col("a").alias("entity"))
        .agg(F.min("lbl").alias("nmin"))
    )
    return (
        labels.join(neighbor_min, "entity", "left")
        .select("entity", F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias("lbl"))
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, component) with component = min entity in the WCC."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    sym = symmetrize(edges).repartition(partitions, "b").persist()
    sym.count()
    labels = vertices.select("entity", F.col("entity").alias("lbl")).localCheckpoint(eager=True)

    from pagerank_optimization_spark.session import iterative_conf

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    with iterative_conf(spark):
        for _ in range(rounds):
            if fixed_rounds is None:
                # lazy checkpoint — materialized by the changed-count job
                new_labels = _step(labels, sym).localCheckpoint(eager=False)
                changed = (
                    new_labels.withColumnRenamed("lbl", "new_lbl")
                    .join(labels, "entity")
                    .filter(F.col("new_lbl") != F.col("lbl"))
                    .count()
                )
                labels = new_labels
                if changed == 0:
                    break
            else:
                labels = _step(labels, sym).localCheckpoint(eager=True)
    sym.unpersist()
    return labels.withColumnRenamed("lbl", "component")
