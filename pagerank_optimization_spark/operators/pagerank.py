"""PageRank power iteration — the reference's kernel, Spark-first.

The reference computes `y[i] += A[i][j] * x[j]` per COO entry
(tuned_variant_baseline.c:83-90) inside a fixed-k ping-pong loop
(tuned_variant_baseline.c:107-148), with NO damping, NO dangling handling
and NO convergence test — dangling columns leak mass. Per the north rule we
implement the full algorithm: damping 0.85, dangling-mass redistribution,
L1-delta convergence (≤1e-6), float64 throughout (the reference's float32
is why its own differential bar is only 1e-4, verify_op.c:11).

Two kernels, differential-tested against each other (mirroring the
reference's REF/TST macro-dispatch harness, verify_op.c:196-239):

- ``join-agg``  — edges ⋈ ranks ON src, then groupBy(dst).sum. Pure
  DataFrame ops: Catalyst/AQE pick the physical join, partial+final hash
  aggregation subsumes the OpenMP array reduction
  (tuned_variant_openmp.c:75-77). Edges are pre-repartitioned by the join
  key and cached, so per-superstep only the |V|-sized rank frontier
  shuffles — the big relation stays put (exchange reuse).

- ``csr-blocks`` — per-partition CSR blocks (the tuned_variant_csr.c:179-229
  counting-sort layout, rebuilt as numpy inside Arrow) cogrouped with the
  bucketed rank vector; vectorized gather `x[col_idx]` is numpy fancy
  indexing (the AVX2 `_mm256_i32gather_ps` analog,
  tuned_variant_simd.c:297-300), partial scatter-add is `np.bincount`
  (tuned_variant_csr.c:74-84). See operators.pagerank_csr.

Superstep lifecycle (lineage hygiene): each iterate is localCheckpoint'ed
(or durably checkpointed via a CheckpointManager) — the DataFrame analog of
the reference's ping-pong buffer swap (pagerank.h:40-45) that also cuts the
otherwise linearly-growing plan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
TOL = 1.0e-6


@dataclass
class PageRankResult:
    ranks: DataFrame
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _prepare(vertices: DataFrame, edges: DataFrame, id_col: str, partitions: int):
    """One-time layout decisions — the Spark analog of DISTRIBUTE_DATA
    (tuned_variant_baseline.c:247-324): pick the physical partitioning once,
    reuse it every superstep."""
    edges = edges.repartition(partitions, "src").persist()
    vertices = vertices.select(id_col).persist()
    n = vertices.count()
    # dangling vertices: no outgoing edges (the reference lets their mass
    # leak, pagerank.c:138-148 normalizes only non-empty columns)
    dangling = vertices.join(
        edges.select(F.col("src").alias(id_col)).distinct(), id_col, "left_anti"
    ).persist()
    edges.count()  # materialize the partitioned cache
    return vertices, edges, dangling, n


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "entity",
    damping: float = DAMPING,
    tol: float = TOL,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    partitions: int | None = None,
    checkpointer=None,
) -> PageRankResult:
    """Damped PageRank with dangling redistribution over weighted edges
    ``(src, dst, weight)`` (weight = 1/outdeg(src), column-stochastic).

    new_rank(v) = (1-d)/n + d * (Σ_{u→v} rank(u)·w(u,v) + dangling_mass/n)

    ``fixed_iters`` runs exactly K supersteps (oracle mode — matches the
    reference's fixed k0, tuned_variant_baseline.c:120); otherwise iterate
    to L1 delta ≤ tol.
    """
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    vertices, edges, dangling, n = _prepare(vertices, edges, id_col, partitions)
    if n == 0:
        raise ValueError("pagerank: empty vertex set (no entities derivable from input)")
    nnz = edges.count()

    start_iter = 0
    ranks = None
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start_iter, ranks = resumed
    if ranks is None:
        # x0 = 1/m uniform (pagerank.c:238; helper.c:79-84)
        ranks = vertices.withColumn("pr", F.lit(1.0 / n))
    ranks = ranks.localCheckpoint(eager=True)

    k = fixed_iters if fixed_iters is not None else max_iter
    deltas: list[float] = []
    metrics: list[dict[str, Any]] = []
    converged = False

    for it in range(start_iter, k):
        t0 = time.monotonic()
        # dangling mass: Σ rank over vertices with outdeg 0 — a |dangling|-row
        # scalar agg, never a collect of the rank vector
        dm_row = ranks.join(dangling, id_col, "left_semi").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0))
        ).collect()
        dangling_mass = dm_row[0][0]

        # SpMV gather-scatter: join on src (only ranks shuffle — edges are
        # cached pre-partitioned on src), partial+final sum by dst
        contribs = (
            edges.join(ranks.withColumnRenamed(id_col, "src"), "src", "inner")
            .groupBy(F.col("dst").alias(id_col))
            .agg(F.sum(F.col("weight") * F.col("pr")).alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling_mass / n
        new_ranks = (
            vertices.join(contribs, id_col, "left")
            .select(
                id_col,
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)

        delta = (
            new_ranks.withColumnRenamed("pr", "pr_new")
            .join(ranks, id_col)
            .agg(F.sum(F.abs(F.col("pr_new") - F.col("pr"))))
            .collect()[0][0]
        )
        deltas.append(float(delta))
        wall_ms = (time.monotonic() - t0) * 1000.0
        row = {
            "superstep": it,
            "l1_delta": float(delta),
            "edges_processed": int(nnz),
            "wall_ms": wall_ms,
            "dangling_mass": float(dangling_mass),
            "n_partitions": partitions,
        }
        metrics.append(row)
        if checkpointer is not None:
            checkpointer.save(it, new_ranks, row)
        ranks = new_ranks
        if fixed_iters is None and delta <= tol:
            converged = True
            break

    edges.unpersist()
    dangling.unpersist()
    return PageRankResult(
        ranks=ranks, iterations=len(deltas) + start_iter, converged=converged,
        deltas=deltas, metrics=metrics,
    )
