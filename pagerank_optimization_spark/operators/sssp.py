"""Multi-source weighted shortest paths (Bellman-Ford with a delta
frontier) over the DIRECTED link graph — the weighted completion of
operators.bfs (engine-brief addition: "cheapest interaction path from
any seed" where edge cost is interaction count/latency, which hop-count
BFS cannot answer; same frontier ping-pong as every other iterative
operator here).

dist(v) = min over paths seed→v of Σ edge weights (weights must be
non-negative; negative weights raise). Each superstep relaxes ONLY the
delta frontier — vertices whose distance improved last round — which is
round-for-round equivalent to full Bellman-Ford relaxation (a vertex
whose distance did not change contributes no new candidates: its
relaxations were already folded in the round it last improved), so
``fixed_rounds=R`` matches an unrolled R-round SQL formulation exactly
while shuffling only the improving layer.

Scale notes: the per-round work is one frontier⋈edges join (edges
pre-partitioned by src and reused every round — the DISTRIBUTE_DATA-
once discipline of the PageRank kernels) plus a map-side-combinable
min-aggregation by dst; the full-outer merge is keyed by entity on both
sides. No driver-side data beyond one scalar per round.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sssp_distances(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    weight_col: str = "weight",
    fixed_rounds: int | None = None,
    max_rounds: int = 10_000,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, dist) for every vertex REACHED from the seed
    set (unreached vertices absent, not null). ``dist`` keeps the weight
    column's type (integer weights → exact integer distances — oracle-
    hashable with no float rounding). One scalar collect per round."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    wtype = edges.schema[weight_col].dataType
    ed = (
        edges.select("src", "dst", F.col(weight_col).alias("w"))
        .repartition(partitions, "src")
        .persist()
    )
    neg = ed.filter(F.col("w") < 0).limit(1).count()
    if neg:
        ed.unpersist()
        raise ValueError("sssp_distances: negative edge weights are not supported")

    dist = (
        seeds.select("entity")
        .distinct()
        .join(vertices.select("entity"), "entity", "left_semi")
        .select("entity", F.lit(0).cast(wtype).alias("dist"))
        .repartition(partitions, "entity")
        .persist()
    )
    dist.count()
    frontier = dist.persist()
    n_frontier = frontier.count()
    metrics: list[dict] = []

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for rnd in range(1, rounds + 1):
        if n_frontier == 0:
            break
        t0 = time.monotonic()
        cand = (
            ed.join(
                frontier.select(F.col("entity").alias("src"), "dist"), "src"
            )
            .select(F.col("dst").alias("entity"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("entity")
            .agg(F.min("nd").alias("nd"))
        )
        merged = dist.join(cand, "entity", "full_outer").persist()
        new_dist = (
            merged.select(
                "entity",
                F.when(F.col("dist").isNull(), F.col("nd"))
                .when(F.col("nd").isNull(), F.col("dist"))
                .otherwise(F.least(F.col("dist"), F.col("nd")))
                .alias("dist"),
            )
            .repartition(partitions, "entity")
            .persist()
        )
        new_frontier = (
            merged.filter(
                F.col("nd").isNotNull()
                & (F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            )
            .select("entity", F.col("nd").alias("dist"))
            .persist()
        )
        n_new = new_frontier.count()
        new_dist.count()
        metrics.append(
            {"round": rnd, "improved": n_new, "wall_ms": (time.monotonic() - t0) * 1000.0}
        )
        merged.unpersist()
        dist.unpersist()
        frontier.unpersist()
        dist, frontier, n_frontier = new_dist, new_frontier, n_new

    ed.unpersist()
    frontier.unpersist()
    return dist
