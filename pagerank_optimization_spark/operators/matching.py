"""Maximal matching — deterministic Israeli–Itai-style rounds (Israeli &
Itai 1986) over the symmetrized simple graph: the edge-analog of Luby's
MIS and the other classic distributed symmetry-breaking primitive
(conflict-free pairing: reviewer assignment, A/B partner selection,
coarsening for multilevel graph partitioning).

Per round every edge gets a deterministic priority (the MIS discipline:
portable 48-bit-MD5 of '{salt}:{round}:a|b' — no rand(), so runs are
reproducible across engines/partitionings and the DuckDB twin replays
every round verbatim); an edge enters the matching iff it is the
minimum-priority incident edge of BOTH its endpoints (a local
handshake — no coordination beyond one neighbor min each). Matched
vertices leave, incident edges dissolve, and w.h.p. a constant fraction
of edges drops per round → O(log |E|) rounds.

Scale shape: each round is one explode-to-endpoints + map-side-
combinable min-agg + two joins back (the PageRank gather shape); the
edge pool only shrinks and is eagerly localCheckpoint-ed per round (the
mis.py / ktruss lineage discipline). One scalar count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.walks import _hash48


def maximal_matching(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 64,
    salt: str = "mm",
    partitions: int | None = None,
) -> DataFrame:
    """→ (a, b, round): a maximal matching of the symmetrized simple
    graph — a < b, no vertex in two rows, and every non-loop input edge
    has at least one matched endpoint (maximality). ``round`` is the
    handshake round that created the pair. Deterministic: a pure
    function of the graph (priority H48('{salt}:{round}:a|b'), edge key
    as tie-break, packed into one sortable varchar — identical compare
    semantics in Spark and DuckDB). All-string/int output → hash-exact
    twin (plans.oracle_sql.matching_query_sql). Raises RuntimeError if
    edges survive ``max_rounds``."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    pool = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_pool = pool.count()
    # scale-adaptive loop width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, n_pool)
    pool = pool.repartition(partitions, "a").localCheckpoint(eager=True)
    matched: list[DataFrame] = []
    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(spark, shuffle_partitions=partitions):
        for t in range(max_rounds):
            if n_pool == 0:
                break
            ek = pool.select(
                "a",
                "b",
                F.concat(
                    F.lpad(
                        _hash48(
                            F.concat(
                                F.lit(f"{salt}:{t}:"),
                                F.col("a"),
                                F.lit("|"),
                                F.col("b"),
                            )
                        ).cast("string"),
                        15,
                        "0",
                    ),
                    F.lit("|"),
                    F.col("a"),
                    F.lit("|"),
                    F.col("b"),
                ).alias("k"),
            )
            ends = ek.select(F.col("a").alias("v"), "k").unionByName(
                ek.select(F.col("b").alias("v"), "k")
            )
            vmin = ends.groupBy("v").agg(F.min("k").alias("mk"))
            sel = (
                ek.join(
                    vmin.select(F.col("v").alias("a"), F.col("mk").alias("mka")), "a"
                )
                .join(
                    vmin.select(F.col("v").alias("b"), F.col("mk").alias("mkb")), "b"
                )
                .filter((F.col("k") == F.col("mka")) & (F.col("k") == F.col("mkb")))
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            matched.append(sel.select("a", "b", F.lit(t).alias("round")))
            mv = (
                sel.select(F.col("a").alias("v"))
                .unionByName(sel.select(F.col("b").alias("v")))
                .distinct()
            )
            pool = (
                pool.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
                .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
                .select("a", "b")
                .repartition(partitions, "a")
                .localCheckpoint(eager=True)
            )
            n_pool = pool.count()

    if n_pool:
        raise RuntimeError(
            f"maximal_matching: {n_pool} edges undecided after {max_rounds} "
            "rounds — raise max_rounds"
        )
    if not matched:
        return spark.createDataFrame([], "a string, b string, round int")
    out = matched[0]
    for d in matched[1:]:
        out = out.unionByName(d)
    return out
