"""Maximal independent set — Luby's algorithm (Luby 1986) over the
symmetrized simple graph, with DETERMINISTIC per-round priorities so runs
are reproducible across engines/partitionings and the DuckDB twin replays
every round verbatim (the walks.py discipline: no ``rand()``, priorities
come from the portable 48-bit-MD5 hash family).

An MIS is the classic distributed symmetry-breaking primitive (conflict-
free scheduling, graph coloring's building block, sparsifying seeds for
labeling). Per round, an undecided vertex joins the set iff its
(hash, entity) priority is strictly smaller than every undecided
neighbor's; winners and their neighbors leave the undecided pool. Each
round is ONE neighbor min-aggregate over the surviving edge set (the
PageRank gather shuffle shape) — no per-vertex loops — and w.h.p. a
constant fraction of EDGES is removed per round, so the loop terminates
in O(log |E|) rounds regardless of graph size.

Scale shape: the undecided vertex/edge sets only shrink; both are
eagerly localCheckpoint-ed per round (the ktruss lineage discipline —
the round plan reads the survivor set through several branches, and
without truncation Catalyst re-analysis compounds per round). One scalar
count per round drives termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.walks import _hash48


def maximal_independent_set(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 64,
    salt: str = "mis",
    partitions: int | None = None,
) -> DataFrame:
    """→ (entity, in_mis boolean, round int): a maximal independent set of
    the symmetrized simple graph (no two in_mis vertices adjacent; every
    non-member has an in_mis neighbor). ``round`` is the Luby round that
    decided the vertex (members and the neighbors they knock out share a
    round). Isolated vertices join in round 0. Deterministic: priorities
    are H48('{salt}:{round}:' || entity) with entity as tie-break, so the
    output is a pure function of the graph.

    All-integer/boolean output → hash-exact DuckDB twin
    (plans.oracle_sql.mis_query_sql). Raises RuntimeError if the pool is
    nonempty after ``max_rounds`` (w.h.p. needs only O(log |E|))."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("a"), F.col("src").alias("b")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # scale-adaptive round width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, sym.count())
    sym = sym.repartition(partitions, "a").localCheckpoint(eager=True)
    undecided = (
        vertices.select("entity").repartition(partitions, "entity")
        .localCheckpoint(eager=True)
    )
    n_undecided = undecided.count()

    decided: list[DataFrame] = []
    from pagerank_optimization_spark.session import iterative_conf

    with iterative_conf(spark, shuffle_partitions=partitions):
        for t in range(max_rounds):
            if n_undecided == 0:
                break
            # priority key: zero-padded H48 then entity tie-break, packed
            # into ONE sortable string so plain varchar min/compare gives
            # the (h, entity) lexicographic order IDENTICALLY in Spark and
            # DuckDB (the dedup._collapse_pair_families key idiom — no
            # struct-comparison semantics to keep in sync). H48 < 2^48 <
            # 10^15, so lpad-15 preserves numeric order.
            pri = undecided.select(
                "entity",
                F.concat(
                    F.lpad(
                        _hash48(
                            F.concat(F.lit(f"{salt}:{t}:"), F.col("entity"))
                        ).cast("string"),
                        15,
                        "0",
                    ),
                    F.lit("|"),
                    F.col("entity"),
                ).alias("k"),
            )
            # min neighbor priority per vertex, neighbors restricted to the
            # pool: one gather join + plain min-agg (the PageRank shape)
            nbr_min = (
                sym.join(pri.select(F.col("entity").alias("b"), "k"), "b")
                .groupBy("a")
                .agg(F.min("k").alias("nk"))
            )
            # r6: winners and their knocked-out neighbors land in ONE
            # checkpointed frame per round (was two eager checkpoints =
            # two jobs; the winner subtree appears in both branches of the
            # union and its aggregation exchange is reused within the one
            # job). Round job count: 5 → 3.
            sel = (
                pri.join(nbr_min.withColumnRenamed("a", "entity"), "entity", "left")
                .filter(F.col("nk").isNull() | (F.col("k") < F.col("nk")))
                .select("entity")
            )
            knocked = (
                sym.join(sel.withColumnRenamed("entity", "b"), "b", "left_semi")
                .select(F.col("a").alias("entity"))
                .distinct()
                .join(sel, "entity", "left_anti")
            )
            decided_t = (
                sel.select("entity", F.lit(True).alias("in_mis"))
                .unionByName(knocked.select("entity", F.lit(False).alias("in_mis")))
                .localCheckpoint(eager=True)
            )
            decided.append(decided_t.select("entity", "in_mis", F.lit(t).alias("round")))
            undecided = (
                undecided.join(decided_t, "entity", "left_anti")
                .repartition(partitions, "entity")
                .localCheckpoint(eager=True)
            )
            n_next = undecided.count()
            # restrict the edge pool to surviving endpoints — it only shrinks
            sym = (
                sym.join(undecided.withColumnRenamed("entity", "a"), "a", "left_semi")
                .join(undecided.withColumnRenamed("entity", "b"), "b", "left_semi")
                .repartition(partitions, "a")
                .localCheckpoint(eager=True)
            )
            n_undecided = n_next

    if n_undecided:
        raise RuntimeError(
            f"maximal_independent_set: {n_undecided} vertices undecided after "
            f"{max_rounds} rounds — raise max_rounds"
        )
    if not decided:
        return vertices.sparkSession.createDataFrame(
            [], "entity string, in_mis boolean, round int"
        )
    out = decided[0]
    for d in decided[1:]:
        out = out.unionByName(d)
    return out
