"""Synchronous label propagation (community detection) — north_star
algorithm #3. Deterministic by construction: each vertex adopts the most
frequent label among its undirected neighbors, ties broken by
lexicographic-min label (a total order, SURVEY.md §7 hard-part 5); a vertex
with no neighbors keeps its label. Synchronous LPA can oscillate on
bipartite structures, so the round count is capped (default 10) rather than
run to fixpoint — rounds are part of the operator's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.components import symmetrize


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    rounds: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(entity, label) after ``rounds`` synchronous supersteps."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    sym = symmetrize(edges).repartition(partitions, "b").persist()
    sym.count()
    labels = vertices.select("entity", F.col("entity").alias("label")).localCheckpoint(eager=True)

    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(spark):
        for _ in range(rounds):
            # gather neighbor labels, count per (vertex, label), pick argmax with
            # min-label tie-break via one window (count desc, label asc)
            neigh = (
                sym.join(labels.withColumnRenamed("entity", "b"), "b", "inner")
                .groupBy(F.col("a").alias("entity"), "label")
                .agg(F.count("*").alias("cnt"))
            )
            w = W.partitionBy("entity").orderBy(F.desc("cnt"), F.asc("label"))
            best = (
                neigh.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("entity", F.col("label").alias("new_label"))
            )
            labels = (
                labels.join(best, "entity", "left")
                .select("entity", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
                .localCheckpoint(eager=True)
            )
    sym.unpersist()
    return labels
