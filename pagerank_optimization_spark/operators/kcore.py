"""k-core extraction — iterative degree peeling on the undirected view of
the link graph (engine-brief addition; the reference is PageRank-only, its
iteration pattern tuned_variant_baseline.c:107-148 is what the peeling
loop generalizes — same ping-pong persist/unpersist discipline as
operators.components).

The k-core is the maximal induced subgraph in which every vertex has
degree ≥ k. Peeling (repeatedly dropping vertices with current degree < k)
reaches that fixpoint in O(peeling-rounds) supersteps; each round is two
semi-joins (restrict the symmetrized edge list to surviving endpoints) and
one count aggregation — all shuffle-partitioned by the edge key, no
driver-side data beyond a scalar survivor count per round.

Scale: the survivor set only shrinks, so per-round shuffle volume is
monotonically non-increasing; the symmetrized edge list is partitioned
once and reused every round (the DISTRIBUTE_DATA-once pattern). No skew
hazard: a hub that survives contributes one count row per partition via
partial aggregation, and the semi-join build side is the (shrinking)
vertex set, never an adjacency list.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.components import symmetrize


def kcore(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    k: int = 3,
    max_rounds: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity) — the vertices of the k-core (exact fixpoint;
    iterates until a round removes nothing). ``max_rounds`` is a safety
    bound only — peeling converges in far fewer rounds on any real graph
    (each round removes at least one vertex or stops).

    Collects ONE scalar per round (the survivor count — the CC ``changed``
    pattern); all data stays distributed."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    sym = symmetrize(edges).localCheckpoint(eager=True)
    # scale-adaptive loop width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, sym.count())
    sym = sym.repartition(partitions, "a").persist()
    sym.count()

    # eager localCheckpoint per round, not persist: the per-round plan
    # references `alive` twice (both semi-joins) and would nest every prior
    # round's lineage — Catalyst re-analysis compounds on deep peels (the
    # measured ktruss hazard, operators.triangles.ktruss). The checkpoint
    # keeps each round's plan shallow; `sym` stays persisted and reused.
    alive = vertices.select("entity").distinct().localCheckpoint(eager=True)
    n_alive = alive.count()
    metrics: list[dict] = []

    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(vertices.sparkSession, shuffle_partitions=partitions):
      for rnd in range(max_rounds):
        t0 = time.monotonic()
        # induced-subgraph degree: both endpoints must be alive
        deg = (
            sym.join(alive.select(F.col("entity").alias("a")), "a", "left_semi")
            .join(alive.select(F.col("entity").alias("b")), "b", "left_semi")
            .groupBy("a")
            .agg(F.count("*").alias("deg"))
        )
        nxt = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("a").alias("entity"))
            .repartition(partitions, "entity")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        metrics.append(
            {
                "round": rnd,
                "alive": n_next,
                "removed": n_alive - n_next,
                "wall_ms": (time.monotonic() - t0) * 1000.0,
            }
        )
        stable = n_next == n_alive
        # no unpersist: checkpointed round states are reclaimed by the
        # ContextCleaner once unreferenced
        alive, n_alive = nxt, n_next
        if stable or n_alive == 0:
            break

    sym.unpersist()
    return alive


def coreness(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_k: int = 32,
    max_rounds: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Full core decomposition: → (entity, coreness) where coreness(v) is
    the largest k with v in the k-core, CAPPED at ``max_k`` (survivors of
    the max_k peel report max_k — "≥ max_k"). Isolated vertices are 0.

    Cores are nested, so the k-core of the original graph equals the
    k-core of the (k−1)-core: the loop peels the SHRINKING survivor set
    at k = 1, 2, … and the vertices dropped while peeling at k have
    coreness k−1 — each vertex is peeled exactly once across the whole
    decomposition, so total work is O(Σ_k peel-rounds) over a
    monotonically shrinking graph. Per-k dropped sets accumulate as
    (entity, coreness) frames, unioned once at the end (≤ max_k frames,
    each already checkpointed by the kcore peel discipline); only scalar
    survivor counts reach the driver."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    sym = symmetrize(edges).localCheckpoint(eager=True)
    # scale-adaptive loop width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, sym.count())
    sym = sym.repartition(partitions, "a").persist()
    sym.count()

    alive = (
        vertices.select("entity").distinct()
        .repartition(partitions, "entity")
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    assigned: list[DataFrame] = []

    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(vertices.sparkSession, shuffle_partitions=partitions):
      for k in range(1, max_k + 1):
        if n_alive == 0:
            break
        # peel at k to fixpoint within the current survivor set
        for _ in range(max_rounds):
            deg = (
                sym.join(alive.select(F.col("entity").alias("a")), "a", "left_semi")
                .join(alive.select(F.col("entity").alias("b")), "b", "left_semi")
                .groupBy("a")
                .agg(F.count("*").alias("deg"))
            )
            nxt = (
                deg.filter(F.col("deg") >= k)
                .select(F.col("a").alias("entity"))
                .repartition(partitions, "entity")
                .localCheckpoint(eager=True)
            )
            n_next = nxt.count()
            stable = n_next == n_alive
            dropped = alive.join(nxt, "entity", "left_anti")
            if n_next != n_alive:
                assigned.append(
                    dropped.select("entity", F.lit(k - 1).alias("coreness"))
                    .localCheckpoint(eager=True)
                )
            alive, n_alive = nxt, n_next
            if stable or n_alive == 0:
                break

    if n_alive > 0:
        assigned.append(alive.select("entity", F.lit(max_k).alias("coreness")))
    sym.unpersist()
    if not assigned:
        return vertices.select("entity", F.lit(0).alias("coreness")).limit(0)
    out = assigned[0]
    for df in assigned[1:]:
        out = out.unionByName(df)
    return out
