"""Distributed graph coloring by iterated Luby MIS — the standard
reduction (Luby 1986 §5; Jones & Plassmann 1993 family): color class c
is a maximal independent set of the residual graph after classes
0..c−1 are removed. Proper by construction (a class is independent),
total by construction (every vertex eventually joins a class — each
MIS is maximal, so an uncolored vertex always has a colored neighbor
pressure shrinking its residual degree), and deterministic end-to-end
(each class reuses operators.mis's portable-hash priorities with salt
'{salt}:{c}', so the DuckDB twin replays every class round-for-round).

Coloring is the symmetry-breaking family's scheduling form: a color
class is a set of vertices whose jobs can run concurrently with no
shared edge (conflict-free batch rounds over the link graph).

Scale shape: pure composition — each class is one mis.py loop (explode
+ min-agg rounds, eagerly checkpointed, edge pool only shrinks), and
the residual restriction between classes is two anti-joins. The class
count on power-law graphs is small (hubs leave early); ``max_colors``
bounds the loop with a loud error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.mis import maximal_independent_set


def luby_coloring(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_colors: int = 64,
    mis_rounds: int = 64,
    salt: str = "col",
    partitions: int | None = None,
) -> DataFrame:
    """→ (entity, color int): a proper coloring of the symmetrized
    simple graph — no edge joins two vertices of one color, every vertex
    colored. color c = the Luby MIS (salt '{salt}:{c}') of the residual
    graph. Raises RuntimeError if vertices remain after ``max_colors``
    classes."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    pool = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("src"), F.col("dst").alias("dst"))
        .distinct()
        .repartition(partitions, "src")
        .localCheckpoint(eager=True)
    )
    remaining = (
        vertices.select("entity").repartition(partitions, "entity")
        .localCheckpoint(eager=True)
    )
    n_remaining = remaining.count()
    classes: list[DataFrame] = []

    for c in range(max_colors):
        if n_remaining == 0:
            break
        mis = maximal_independent_set(
            remaining,
            pool,
            max_rounds=mis_rounds,
            salt=f"{salt}:{c}",
            partitions=partitions,
        )
        members = (
            mis.filter(F.col("in_mis")).select("entity").localCheckpoint(eager=True)
        )
        classes.append(members.select("entity", F.lit(c).alias("color")))
        remaining = (
            remaining.join(members, "entity", "left_anti")
            .repartition(partitions, "entity")
            .localCheckpoint(eager=True)
        )
        n_remaining = remaining.count()
        pool = (
            pool.join(remaining.withColumnRenamed("entity", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("entity", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(partitions, "src")
            .localCheckpoint(eager=True)
        )

    if n_remaining:
        raise RuntimeError(
            f"luby_coloring: {n_remaining} vertices uncolored after "
            f"{max_colors} classes — raise max_colors"
        )
    if not classes:
        return spark.createDataFrame([], "entity string, color int")
    out = classes[0]
    for d in classes[1:]:
        out = out.unionByName(d)
    return out
