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

    ed = edges.select(F.col("src").alias("u"), F.col("dst").alias("w")).persist()
    ed.count()
    settled = (
        vertices.select(
            F.col("entity").alias("v"),
            F.col("entity").alias("u"),
            F.lit(0).alias("d"),
        )
        .repartition(partitions, "v", "u")
        .persist()
    )
    settled.count()
    frontier = settled
    for rnd in range(1, r + 1):
        ext = (
            frontier.filter(F.col("d") == rnd - 1)
            .join(ed, "u")
            .select("v", F.col("w").alias("u"))
            .distinct()
            .repartition(partitions, "v", "u")
        )
        new = ext.join(settled, ["v", "u"], "left_anti").select(
            "v", "u", F.lit(rnd).alias("d")
        )
        nxt = settled.unionByName(new).repartition(partitions, "v", "u").persist()
        nxt.count()
        settled.unpersist()
        settled = frontier = nxt
    ed.unpersist()
    h = (
        settled.filter(F.col("d") > 0)
        .groupBy("v")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("d")), 8).alias("harmonic"))
    )
    return (
        vertices.select(F.col("entity"))
        .join(h.select(F.col("v").alias("entity"), "harmonic"), "entity", "left")
        .select("entity", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )
