"""Multi-source BFS hop distance over the DIRECTED link graph
(engine-brief addition: reachability/radius questions over the transcript
graph — "how many hops from any seed entity" — that PageRank-style mass
propagation cannot answer; same frontier ping-pong as the other iterative
operators).

Frontier expansion with min-hop semantics: dist(v) = min hops from any
seed along src→dst edges. Each superstep joins the CURRENT frontier
(newly discovered vertices only — NOT the whole distance table) against
the edge list, anti-joins already-settled vertices, and unions the new
layer into the settled set. Frontier-only joins keep per-round shuffle
volume proportional to the layer being discovered, the BFS analog of
PageRank's frontier-only rank shuffle.

``fixed_rounds`` mirrors the CC/LPA oracle mode: exactly R expansion
rounds, matching an unrolled SQL formulation round-for-round even if the
graph has longer shortest paths; default mode runs until the frontier
exhausts (exact distances).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    fixed_rounds: int | None = None,
    max_rounds: int = 10_000,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, dist long) for every vertex REACHED from the
    seed set (unreached vertices are absent, not null-distanced).

    ``seeds``: DataFrame with an ``entity`` column (any extra columns
    ignored); seeds not present in ``vertices`` are ignored. One scalar
    collect per round (frontier size)."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    ed = edges.select("src", "dst").repartition(partitions, "src").persist()
    ed.count()

    settled = (
        seeds.select("entity")
        .distinct()
        .join(vertices.select("entity"), "entity", "left_semi")
        .select("entity", F.lit(0).cast("long").alias("dist"))
        .repartition(partitions, "entity")
        .persist()
    )
    settled.count()
    frontier = settled.select("entity").persist()
    n_frontier = frontier.count()
    metrics: list[dict] = []

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for rnd in range(1, rounds + 1):
        if n_frontier == 0:
            break
        t0 = time.monotonic()
        nxt = (
            ed.join(frontier.select(F.col("entity").alias("src")), "src", "left_semi")
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(settled, "entity", "left_anti")
            .repartition(partitions, "entity")
            .persist()
        )
        n_new = nxt.count()
        new_settled = settled.unionByName(
            nxt.select("entity", F.lit(rnd).cast("long").alias("dist"))
        ).persist()
        new_settled.count()
        metrics.append(
            {"round": rnd, "discovered": n_new, "wall_ms": (time.monotonic() - t0) * 1000.0}
        )
        settled.unpersist()
        frontier.unpersist()
        settled, frontier, n_frontier = new_settled, nxt, n_new

    ed.unpersist()
    frontier.unpersist()
    return settled
