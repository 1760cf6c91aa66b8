"""Distance-based centrality: exact bounded-radius harmonic centrality.

H_r(v) = Σ_{u: 0 < d(v,u) ≤ r} 1/d(v,u) — the centrality of choice for
directed, possibly-disconnected graphs (Boldi & Vigna 2014: harmonic,
unlike closeness, handles unreachable pairs by contributing 0 instead of
breaking). Bounded radius r is both the practical form (influence decays
with distance) and the oracle-checkable one.

Same exact↔sketch split as the neighborhood family: this operator is the
EXACT pair-expansion path (all-sources BFS layers carrying min-distance;
cost Σ_v |ball_r(v)| pair rows, right for small r / oracle checking);
at 100 TB radii the HyperBall sketch (operators.neighborhood) estimates
|ball| per radius, and harmonic follows from the ball-size differences —
H(v) ≈ Σ_d (|ball_d| − |ball_{d−1}|)/d with HLL accuracy (Boldi & Vigna's
HyperBall paper computes exactly this).

Per-round plan: frontier-only expansion (only pairs discovered in round
d−1 join edges in round d), anti-join against settled pairs, union —
the bfs.py loop lifted from one source set to all vertices at once;
every stage is a partitioned equi-join or map-side-combinable agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def harmonic_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    r: int,
    *,
    partitions: int | None = None,
) -> DataFrame:
    """→ (entity, harmonic double): Σ 1/d over vertices within ≤ r hops
    along src→dst edges (8-dp rounded). Vertices reaching nothing get
    0.0."""
    if r < 1:
        raise ValueError(f"harmonic_centrality: r must be >= 1, got {r}")
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    # r6: the settled set is Σ_v |ball_r(v)| PAIR rows and every round
    # shuffles it — so (1) vertices map to dense integer vids first
    # (16-byte pairs instead of two entity strings on every exchange; one
    # |V|-sized join maps the bounded per-vertex result back at the end),
    # (2) the redundant repartition between the frontier's distinct and
    # the anti-join is gone (both already hash-partition on (v, u) at the
    # loop width), and (3) the loop width is scale-adaptive.
    from pagerank_optimization_spark.operators.graph_build import vertex_ids
    from pagerank_optimization_spark.plans.partitioning import effective_partitions
    from pagerank_optimization_spark.session import iterative_conf

    ids = vertex_ids(vertices.select("entity"))
    ed = (
        edges.select("src", "dst")
        .join(ids.select(F.col("entity").alias("src"), F.col("vid").alias("u")), "src")
        .join(ids.select(F.col("entity").alias("dst"), F.col("vid").alias("w")), "dst")
        .select("u", "w")
        .localCheckpoint(eager=True)
    )
    requested = partitions
    ed.count()
    settled = (
        ids.select(
            F.col("vid").alias("v"),
            F.col("vid").alias("u"),
            F.lit(0).alias("d"),
        )
        .persist()
    )
    # the settled PAIR set grows ball-exponentially with the radius, so the
    # loop width is re-derived PER ROUND from the measured settled count
    # (sizing it once from |E| crammed a multi-million-pair round into a
    # handful of tasks — measured 3.5× slower than the static-32 form);
    # the caller's value stays the cap
    n_settled = settled.count()
    frontier = settled
    for rnd in range(1, r + 1):
        partitions = effective_partitions(requested, n_settled * 4)
        with iterative_conf(spark, shuffle_partitions=partitions):
            ext = (
                frontier.filter(F.col("d") == rnd - 1)
                .join(ed, "u")
                .select("v", F.col("w").alias("u"))
                .distinct()
            )
            new = ext.join(settled, ["v", "u"], "left_anti").select(
                "v", "u", F.lit(rnd).alias("d")
            )
            nxt = settled.unionByName(new).repartition(partitions, "v", "u").persist()
            n_settled = nxt.count()
            settled.unpersist()
            settled = frontier = nxt
    ed.unpersist()
    h = (
        settled.filter(F.col("d") > 0)
        .groupBy("v")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("d")), 8).alias("harmonic"))
    )
    return (
        ids.join(h.withColumnRenamed("v", "vid"), "vid", "left")
        .select("entity", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )
