"""Distributed global ranking + Spearman rank correlation.

``global_rank`` solves the trap every naive implementation falls into:
`row_number().over(Window.orderBy(...))` has NO partition key, so Spark
funnels the entire table through ONE task — the exact anti-pattern the
plan audits reject. Instead: range-partition by the order, rank within
each partition, then lift to global ranks with the P-row exclusive
prefix (collect is bounded by the partition count, never |rows|) — the
same two-level scan as sampling.pack_documents, and like it the result
is partition-count-invariant (tested).

``spearman_rank_correlation`` compares two rankings of the same keys —
the standard "did the cheap variant preserve the ordering that matters"
check (e.g. recency-weighted PageRank vs plain PageRank, or a sketch
vs its exact operator). Values are rounded to 8 decimals BEFORE ranking
(the repo's float-parity convention), with the key as the tiebreak, so
the rank permutation is a deterministic total order on both engines;
with distinct ranks Spearman ρ is exactly the Pearson correlation of
the rank columns (corr() twins exactly — the sample/population factors
cancel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``rank_col`` under the TOTAL order given
    by ``order_cols`` (the caller must make the order total — include a
    unique tiebreak column) — no single-partition window anywhere."""
    spark = df.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    # localCheckpoint: range boundaries are re-sampled per execution, so
    # _pid must come from ONE materialization (pack_documents precedent)
    local = parted.withColumn("_lr", F.row_number().over(w)).localCheckpoint(eager=True)
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    counts.sort(key=lambda r: r._pid)
    prefix, acc = {}, 0
    for row in counts:
        prefix[row._pid] = acc
        acc += row._n
    pre = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _prefix long"
    )
    return (
        local.join(F.broadcast(pre), "_pid")
        .withColumn(rank_col, F.col("_prefix") + F.col("_lr"))
        .drop("_pid", "_lr", "_prefix")
    )


def spearman_rank_correlation(
    a: DataFrame,
    b: DataFrame,
    *,
    key_col: str = "entity",
    value_col: str = "pr",
    round_to: int = 6,
) -> DataFrame:
    """→ one row (n, spearman): Spearman ρ between two scorings of the
    same key set. Both sides are ranked by (round(value, 8) DESC,
    key ASC) — a deterministic total order; keys present in only one
    input are inner-joined away (ranking happens BEFORE the join, so a
    mismatched key set shifts ρ — by design, it is a real disagreement)."""

    def ranked(df: DataFrame, name: str) -> DataFrame:
        sel = df.select(
            F.col(key_col).alias("k"), F.round(value_col, 8).alias("v")
        )
        return global_rank(
            sel, [F.col("v").desc(), F.col("k").asc()], rank_col=name
        ).select("k", name)

    joined = ranked(a, "ra").join(ranked(b, "rb"), "k")
    return joined.agg(
        F.count("*").alias("n"),
        F.round(
            F.corr(F.col("ra").cast("double"), F.col("rb").cast("double")), round_to
        ).alias("spearman"),
    )
