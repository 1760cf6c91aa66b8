"""Katz centrality — attenuated path counting on the directed link graph
(engine-brief addition; the reference is PageRank-only — its
power-iteration ping-pong, tuned_variant_baseline.c:107-148, is once more
the loop shape). Completes the classic link-analysis family next to
PageRank (operators.pagerank), HITS (operators.hits) and SALSA
(operators.salsa): where PageRank splits each vote by the voter's
out-degree, Katz counts EVERY walk into a vertex, damped by length —
katz(v) = Σ_t α^t · |{walks of length t ending at v}| · β, i.e. the
truncated Neumann series x = Σ_{t=0..k} (α·Aᵀ)^t β·1 computed as

    x_i(v) = β + α · Σ_{u→v} x_{i-1}(u),   x_0 = β·1

(Katz 1953; Newman, "Networks" §7.2). For |α| < 1/λ_max the series
converges; the fixed-k truncation is both the practical form and the
oracle-checkable one (the SQL twin unrolls the same k gathers). The
result is L1-normalized ONCE at the end so scores are comparable across
graph sizes, like every other score vector in this engine — the
normalization makes β a no-op for any β > 0, but it is kept as a
parameter because the UNnormalized series is what the classic definition
states, and the twin mirrors the same algebra term for term.

Scale shape: each superstep is ONE shuffle — the gather join of the |V|
score vector against the by-src edge partitioning plus a map-side-
combinable groupBy(dst) sum (in-degree hubs collapse to ≤ P partial rows
before the exchange, the PageRank contribution-sum argument). The edge
list is repartitioned once and reused every round (DISTRIBUTE_DATA-once)
and — unlike HITS/SALSA, which pay one normalization scalar per
half-step — this loop has ZERO driver round-trips: the final
normalization rides the plan as a broadcast one-row aggregate. At 1000
executors: k shuffles of |E| rows, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def katz(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    k: int = 5,
    alpha: float = 0.05,
    beta: float = 1.0,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, katz): L1-normalized truncated Katz series
    after exactly ``k`` gather rounds from x₀ = β. Vertices with no
    in-edges hold the bare β term (normalized — they stay in the result;
    the score vector is |V|-dense like the PageRank kernel's).

    ``alpha`` must lie in (0, 1) and below 1/λ_max for the untruncated
    series to converge; the default 0.05 is safe for any graph with
    max in-degree < 20/α = 400 voting rounds deep — at k=5 truncation
    the sum is finite regardless, so the guard is only on the range.
    """
    if k < 1:
        raise ValueError(f"katz: k must be ≥ 1, got {k}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"katz: alpha must be in (0, 1), got {alpha}")
    if beta <= 0.0:
        raise ValueError(f"katz: beta must be > 0 (normalization needs positive mass), got {beta}")
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    # scale-adaptive loop width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, edges.select("src", "dst").count())
    # one by-src partitioning, built once, reused every round
    by_src = edges.select("src", "dst").repartition(partitions, "src").persist()
    by_src.count()
    verts = vertices.select("entity").distinct().persist()
    verts.count()

    # x₀ = β·1, materialized as a plan LEAF — per-round localCheckpoint is
    # the loop lineage hygiene every iterative operator here uses
    # (hits.py:60-66: persist alone grows the logical tree one gather-join
    # per round and Catalyst re-analysis goes quadratic in k)
    x = verts.select("entity", F.lit(float(beta)).alias("katz")).localCheckpoint(eager=True)
    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(vertices.sparkSession, shuffle_partitions=partitions):
        for _ in range(k):
            contrib = (
                by_src.join(x.withColumnRenamed("entity", "src"), "src")
                .groupBy(F.col("dst").alias("entity"))
                .agg(F.sum("katz").alias("contrib"))
            )
            x = (
                verts.join(contrib, "entity", "left")
                .select(
                    "entity",
                    (
                        F.lit(float(beta))
                        + F.lit(float(alpha)) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("katz"),
                )
                .localCheckpoint(eager=True)
            )

    # final L1 normalization as a broadcast one-row aggregate — no collect;
    # the total is ≥ n·β > 0 by construction, so no zero guard is needed
    total = x.agg(F.sum("katz").alias("tot"))
    result = x.crossJoin(F.broadcast(total)).select(
        "entity", (F.col("katz") / F.col("tot")).alias("katz")
    )
    by_src.unpersist(), verts.unpersist()
    return result
