"""SALSA (Stochastic Approach for Link-Structure Analysis) — Lempel &
Moran's degree-normalized HITS on the directed link graph (engine-brief
addition; the reference is PageRank-only — its power-iteration ping-pong,
tuned_variant_baseline.c:107-148, is again the pattern both half-steps
reuse, and the 1/outdeg edge normalization is the reference's own
column-stochastic convention, normalize.c semantics, applied per side).

Where HITS mutually reinforces raw sums (a hub pointing at 1000 pages
votes 1000 full votes), SALSA is the random-walk form — every vote is
split across the voter's links, so scores converge to the stationary
distribution of the bipartite backward/forward walk and spam farms can't
inflate authority by fan-out alone:

    auth_i(v) = Σ_{u→v} hub_{i-1}(u) / outdeg(u)   then  auth_i /= Σ auth_i
    hub_i(u)  = Σ_{u→v} auth_i(v)  / indeg(v)      then  hub_i  /= Σ hub_i

Scale shape: identical to operators.hits — each half-step is ONE shuffle
(gather join of the |V| score vector against the edge list + a map-side-
combinable groupBy sum; degree hubs collapse to ≤ P partial rows before
the exchange). The per-edge walk weights (1/outdeg(src), 1/indeg(dst))
are computed ONCE from two degree aggregates and ride the cached
per-direction edge partitionings, so the k-iteration loop pays exactly
the PageRank cost envelope: 2k frontier-sized shuffles, one scalar
collect per half-step, no new hazards at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salsa(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    k: int = 5,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, auth, hub) after exactly ``k`` iterations from
    the uniform hub vector h₀ = 1/|V|. Vertices with no in-edges hold
    auth 0; no out-edges, hub 0 (coalesced — the score vector stays
    |V|-dense like the PageRank kernel's).

    A zero normalization sum (edgeless graph) leaves the vector all-zero
    instead of dividing by zero — mirrored by ``nullif`` in the SQL twin
    (plans.oracle_sql.salsa_query_sql).
    """
    if k < 1:
        raise ValueError("salsa: k must be ≥ 1 (auth is undefined before the first half-step)")
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    from pyspark.sql import Window as W

    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    ev = edges.select("src", "dst")
    # per-edge walk weights, computed once: a hub's forward vote splits
    # 1/outdeg(src); an authority's backward vote splits 1/indeg(dst).
    # r6: both degrees are COUNT windows over the edge list (two chained
    # exchanges) instead of two aggregates + two joins (four), and the
    # weighted table materializes ONCE (eager checkpoint) — its count also
    # sizes the scale-adaptive loop width (caller's value stays the cap).
    ew = ev.select(
        "src",
        "dst",
        (F.lit(1.0) / F.count(F.lit(1)).over(W.partitionBy("src"))).alias("w_fwd"),
        (F.lit(1.0) / F.count(F.lit(1)).over(W.partitionBy("dst"))).alias("w_bwd"),
    ).localCheckpoint(eager=True)
    partitions = effective_partitions(partitions, ew.count())
    # one partitioning per gather direction, built once, reused every round
    by_src = ew.repartition(partitions, "src").persist()
    by_dst = ew.repartition(partitions, "dst").persist()
    by_src.count(), by_dst.count()

    verts = vertices.select("entity").distinct().persist()
    n = verts.count()

    # every per-round state frame is localCheckpoint'ed — the lineage
    # hygiene the HITS/PageRank loops established (hits.py:60-66): persist
    # alone leaves the logical tree growing a gather-join per half-step
    hub = verts.select("entity", F.lit(1.0 / n).alias("score")).localCheckpoint(eager=True)
    auth: DataFrame | None = None

    def _half(scores: DataFrame, edge_part: DataFrame, gather: str, emit: str, w: str, eager: bool = True) -> DataFrame:
        """gather degree-split scores over one direction, L1-normalize,
        densify. r6: the normalization total rides the plan as a broadcast
        one-row aggregate (the katz.py idiom) instead of a per-half-step
        collect — ONE job per half-step (the eager checkpoint) instead of
        two, zero driver round-trips inside the loop. The raw subtree
        appears in both the agg and the join branch; its aggregation
        exchange is identical in both and reused within the job. Same
        algebra: score = coalesce(raw, 0) · (1/total), 0 when total ≤ 0."""
        raw = (
            edge_part.join(scores.withColumnRenamed("entity", gather), gather)
            .groupBy(F.col(emit).alias("entity"))
            .agg(F.sum(F.col("score") * F.col(w)).alias("raw"))
        )
        total = raw.agg(F.coalesce(F.sum("raw"), F.lit(0.0)).alias("tot"))
        scale = F.when(F.col("tot") > 0, F.lit(1.0) / F.col("tot")).otherwise(F.lit(0.0))
        out = (
            verts.join(raw, "entity", "left")
            .crossJoin(F.broadcast(total))
            .select("entity", (F.coalesce(F.col("raw"), F.lit(0.0)) * scale).alias("score"))
        )
        return out.localCheckpoint(eager=True) if eager else out

    from pagerank_optimization_spark.session import iterative_conf

    # (a lazy-auth, one-checkpoint-per-round variant was measured SLOWER —
    # the doubled per-round plan costs more analysis than the saved job)
    with iterative_conf(spark, shuffle_partitions=partitions):
        for _ in range(k):
            auth = _half(hub, by_src, gather="src", emit="dst", w="w_fwd")
            hub = _half(auth, by_dst, gather="dst", emit="src", w="w_bwd")

    result = (
        hub.withColumnRenamed("score", "hub")
        .join(auth.withColumnRenamed("score", "auth"), "entity")
        .select("entity", "auth", "hub")
    )
    by_src.unpersist(), by_dst.unpersist(), verts.unpersist()
    return result
