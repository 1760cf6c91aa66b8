"""Weakly connected components — min-label propagation over the same
gather-scatter substrate as PageRank (north_star: CC is a first-class
algorithm of the engine; the reference has no CC, its SpMV loop
tuned_variant_baseline.c:107-148 is the iteration pattern we generalize).

Labels are entity strings; the component label is the lexicographic-min
entity in the component — exact and deterministic (north rule: components
exact, not approximate).

Two modes:
- ``fixed_rounds=k`` — exactly k supersteps of PLAIN min-label propagation
  (oracle mode: matches an unrolled SQL formulation round-for-round even
  pre-convergence);
- default — min-label propagation PLUS pointer-doubling shortcutting
  (lbl(v) ← lbl(lbl(v)) each round), iterated until no label changes.
  Plain propagation needs O(diameter) rounds — a 10⁴-long reply chain at
  100× scale means 10⁴ supersteps; with doubling the covered distance
  roughly doubles per round, so convergence is O(log n) rounds (the
  classic pointer-jumping bound; same idea as large-star/small-star,
  Kiveris et al., "Connected Components in MapReduce and Beyond").
  Doubling is sound for min-labels: lbl(v) is always an existing entity
  with lbl(lbl(v)) ≤ lbl(v) ≤ v, and both are upper-bounded below by the
  true component min — the fixpoint is unchanged, only reached faster.

``checkpointer``: optional CheckpointManager — labels land durably per
round under the same commit protocol as PageRank ranks (labels are
discrete strings, so a resumed run is bitwise-identical for free).
"""

from __future__ import annotations

import time

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


def _shortcut(labels: DataFrame) -> DataFrame:
    """Pointer doubling: lbl(v) ← lbl(lbl(v)). lbl(v) is an existing entity
    (a min over entities), so the self-join on lbl = entity always hits;
    the left join + coalesce only guards degenerate inputs."""
    l2 = labels.select(F.col("entity").alias("lbl"), F.col("lbl").alias("_lbl2"))
    return labels.join(l2, "lbl", "left").select(
        "entity", F.coalesce(F.col("_lbl2"), F.col("lbl")).alias("lbl")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
    partitions: int | None = None,
    checkpointer=None,
) -> DataFrame:
    """→ DataFrame(entity, component) with component = min entity in the WCC."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    sym = symmetrize(edges).repartition(partitions, "b").persist()
    n_sym = sym.count()

    start_round = 0
    labels = None
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start_round, labels = resumed
            labels = labels.localCheckpoint(eager=True)
    if labels is None:
        labels = vertices.select("entity", F.col("entity").alias("lbl")).localCheckpoint(eager=True)

    from pagerank_optimization_spark.session import iterative_conf

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    with iterative_conf(spark):
        for it in range(start_round, rounds):
            t0 = time.monotonic()
            if fixed_rounds is None:
                # propagate + pointer-double; lazy checkpoint — materialized
                # by the changed-count job
                new_labels = _shortcut(_step(labels, sym)).localCheckpoint(eager=False)
                changed = (
                    new_labels.withColumnRenamed("lbl", "new_lbl")
                    .join(labels, "entity")
                    .filter(F.col("new_lbl") != F.col("lbl"))
                    .count()
                )
                labels = new_labels
                if checkpointer is not None:
                    checkpointer.save(
                        it, labels,
                        {"superstep": it, "l1_delta": float(changed),
                         "edges_processed": n_sym,
                         "wall_ms": (time.monotonic() - t0) * 1000.0,
                         "n_partitions": partitions},
                    )
                if changed == 0:
                    break
            else:
                labels = _step(labels, sym).localCheckpoint(eager=True)
                if checkpointer is not None:
                    checkpointer.save(
                        it, labels,
                        {"superstep": it, "edges_processed": n_sym,
                         "wall_ms": (time.monotonic() - t0) * 1000.0,
                         "n_partitions": partitions},
                    )
    sym.unpersist()
    return labels.withColumnRenamed("lbl", "component")
