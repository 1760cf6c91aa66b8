"""Vectorized CSR-blocks PageRank kernel (the north-star physical design).

The reference's fastest variants rebuild the COO edge list into CSR via a
counting sort (histogram + exclusive prefix-sum + stable scatter,
tuned_variant_csr.c:179-229) so each output cell is one contiguous row
segment (tuned_variant_csr.c:72-84), then vectorize the gather with AVX2
`_mm256_i32gather_ps` (tuned_variant_simd.c:297-300) and reduce each
segment with an 8-lane horizontal sum (tuned_variant_simd.c:244-269).

The Spark-native rebuild of that layout — DESTINATION-bucketed so each
superstep is ONE shuffle:

- edges are bucketed by ``dst % P``; each bucket's edges are compiled ONCE
  into a numpy CSR block — destinations counting-sorted (np.argsort stable
  ≡ the reference's histogram+scatter), an ``indptr`` built from run
  lengths, and the source index localized to the bucket's OWN dense
  source-slot space (np.unique inverse — only sources that actually feed
  this bucket get a slot);
- a static ``routes`` table (src vid → bucket, local slot) records which
  rank entries each bucket needs. Blocks and routes are the
  DISTRIBUTE_DATA moment (tuned_variant_baseline.c:247-324): layout is
  decided once, cached, and reused every superstep;
- per superstep, the rank vector (hash-partitioned on vid, same layout as
  ``routes`` — the join is exchange-free) is routed to its buckets and
  cogrouped with the blocks inside ``applyInPandas``; the gather
  ``x[src_idx]`` is numpy fancy indexing (the `i32gather` analog for a
  whole Arrow batch, not 8 lanes), the per-destination segment sum is
  ``np.add.reduceat`` over ``indptr`` (the CSR row-segment sum,
  tuned_variant_csr.c:74-84);
- because every destination lives in exactly ONE bucket (dst % P), the
  per-bucket segment sums are already FINAL — there is no second global
  groupBy(dst) shuffle. This is the whole point of CSR over COO
  (tuned_variant_csr.c:72-84, writeup §I): the layout pre-pays the
  scatter so the hot loop only gathers and reduces.

Per-superstep shuffle ledger: route-join (exchange-free, both sides
pre-partitioned on vid) → ONE exchange into dst-buckets → final sums.
The old src-bucketed design paid that exchange PLUS a global
groupBy(vid).sum of partials every superstep.

No per-row Python anywhere (input_hint requirement): everything crossing
the JVM↔Python boundary is an Arrow batch, everything inside is numpy.

The run-length SIMD segmentation of the reference
(`split_indices`, tuned_variant_simd.c:186-242) is deliberately absent:
Arrow batches give full-width vectorization regardless of run lengths
(SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pagerank_optimization_spark.operators.graph_build import vertex_ids

# Above this row count an id-map broadcast risks executor OOM at the
# 10^9-vertex scale this engine targets — fall back to a shuffle join
# (AQE still upgrades it to broadcast if the measured size is tiny).
BROADCAST_ROW_LIMIT = 1_000_000

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_src", T.LongType(), False),       # local source slots
        T.StructField("src_idx", T.BinaryType(), False),   # int64 local gather index
        T.StructField("indptr", T.BinaryType(), False),    # int64 CSR offsets
        T.StructField("dst_vid", T.BinaryType(), False),   # int64 distinct dst per segment
        T.StructField("weight", T.BinaryType(), False),    # float64 edge weights
    ]
)

CONTRIB_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("contrib", T.DoubleType(), False),
    ]
)


def build_csr_blocks(vid_edges: DataFrame, n_buckets: int) -> DataFrame:
    """Compile (src, dst, weight) vid-space edges into P cached CSR blocks,
    bucketed by DESTINATION (dst % P) so per-superstep segment sums are
    final without a global re-aggregation.

    Inside each bucket: stable-sort edges by dst (the counting sort of
    tuned_variant_csr.c:179-229 — np.argsort(kind='stable') over a bounded
    key is the same algorithm), emit indptr over the dst runs, and localize
    src to the bucket's dense slot space via np.unique's inverse (ascending
    src order — the same order build_routes numbers slots in).
    """
    P = n_buckets

    def compile_block(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        w = pdf["weight"].to_numpy(dtype=np.float64)
        order = np.argsort(dst, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
        dst_unique, counts = np.unique(dst, return_counts=True)
        indptr = np.zeros(len(dst_unique) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        src_unique, src_idx = np.unique(src, return_inverse=True)
        return pd.DataFrame(
            {
                "bucket": [b],
                "n_src": [len(src_unique)],
                "src_idx": [src_idx.astype(np.int64).tobytes()],
                "indptr": [indptr.tobytes()],
                "dst_vid": [dst_unique.tobytes()],
                "weight": [w.tobytes()],
            }
        )

    return (
        vid_edges.withColumn("bucket", F.pmod(F.col("dst"), F.lit(P)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(compile_block, schema=BLOCK_SCHEMA)
    )


def build_routes(vid_edges: DataFrame, n_buckets: int, partitions: int) -> DataFrame:
    """Static routing table (vid, bucket, pos): source vid → every dst
    bucket it feeds, with the bucket-local slot its rank value occupies.

    Slot numbering: row_number over (bucket, src ascending) — exactly the
    order np.unique gives the block's local src space, so ``x[pos] = pr``
    inside the kernel lands each value in its gather slot.

    Size: one row per distinct (src, dst-bucket) pair ≤ min(nnz, |V|·P) —
    this is the per-superstep shuffle volume, the same frontier-replication
    bound a vertex-cut graph system pays."""
    r = (
        vid_edges.select(
            F.col("src").alias("vid"),
            F.pmod(F.col("dst"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .distinct()
    )
    w = W.partitionBy("bucket").orderBy("vid")
    return (
        r.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        # co-partition with the canonical rank layout (hash on vid, same
        # partition count) → the per-superstep ranks⋈routes join is
        # exchange-free on both sides
        .repartition(partitions, "vid")
        .sortWithinPartitions("vid")
    )


def make_csr_step(blocks: DataFrame, routes: DataFrame, n_buckets: int):
    """Returns step_fn(ranks_vid_df) -> contribs(vid, contrib) using the
    cached CSR blocks + routes. ranks must have columns (vid, pr)."""

    def spmv(key, block_pdf: pd.DataFrame, routed_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or routed_pdf.empty:
            return pd.DataFrame(
                {"vid": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="float64")}
            )
        n_src = int(block_pdf["n_src"].iloc[0])
        src_idx = np.frombuffer(block_pdf["src_idx"].iloc[0], dtype=np.int64)
        indptr = np.frombuffer(block_pdf["indptr"].iloc[0], dtype=np.int64)
        dst_vid = np.frombuffer(block_pdf["dst_vid"].iloc[0], dtype=np.int64)
        w = np.frombuffer(block_pdf["weight"].iloc[0], dtype=np.float64)
        x = np.zeros(n_src, dtype=np.float64)
        x[routed_pdf["pos"].to_numpy(dtype=np.int64)] = routed_pdf["pr"].to_numpy(
            dtype=np.float64
        )
        contrib = w * x[src_idx]                      # vectorized gather+mul
        sums = np.add.reduceat(contrib, indptr[:-1])  # CSR segment sum — FINAL per dst
        return pd.DataFrame({"vid": dst_vid, "contrib": sums})

    def step(ranks: DataFrame) -> DataFrame:
        routed = routes.join(ranks, "vid")  # exchange-free: both hash(vid, P)
        return (
            blocks.groupBy("bucket")
            .cogroup(routed.groupBy("bucket"))
            .applyInPandas(spmv, schema=CONTRIB_SCHEMA)
        )

    return step


def pagerank_csr(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "entity",
    damping: float,
    tol: float,
    max_iter: int,
    fixed_iters: int | None,
    partitions: int,
    reset: DataFrame | None = None,
    checkpointer=None,
):
    """CSR-blocks kernel entry (called via pagerank(kernel='csr-blocks')).

    Runs the superstep loop in dense vid space, then maps ranks back to
    entities; the result is column-identical to the join-agg kernel
    (cross-kernel differential bar: 1e-12, SURVEY.md §5 item 3).
    ``reset``: optional personalized teleport distribution (id_col, weight)
    — mapped into vid space and normalized here, so the kernel dispatch
    contract is feature-uniform with join-agg (the reference's macro
    dispatch runs every variant through the same rig,
    build_test_rig.sh:37-48).
    """
    from pagerank_optimization_spark.operators.pagerank import PageRankResult, _dangling_of, _iterate

    # normalize the external id column to 'entity' for the vid mapping
    # (works for string entities and for already-numeric ids alike)
    ids = vertex_ids(
        vertices.select(F.col(id_col).alias("entity")), partitions=partitions
    ).persist()
    n = ids.count()
    if n == 0:
        raise ValueError("pagerank: empty vertex set (no entities derivable from input)")

    # id-map joins: broadcast only while the map verifiably fits; above the
    # limit a shuffle join (AQE may still upgrade) — a forced broadcast of a
    # 10^9-row map is an executor OOM
    hint = F.broadcast if n <= BROADCAST_ROW_LIMIT else (lambda df: df)
    src_ids = ids.select(F.col("entity").alias("src"), F.col("vid").alias("src_vid"))
    dst_ids = ids.select(F.col("entity").alias("dst"), F.col("vid").alias("dst_vid"))
    vid_edges = (
        edges.join(hint(src_ids), "src")
        .join(hint(dst_ids), "dst")
        .select(F.col("src_vid").alias("src"), F.col("dst_vid").alias("dst"), "weight")
    )
    blocks = build_csr_blocks(vid_edges, partitions).persist()
    blocks.count()
    routes = build_routes(vid_edges, partitions, partitions).persist()
    routes.count()
    nnz = vid_edges.count()

    vid_vertices = ids.select("vid").repartition(partitions, "vid").persist()
    dangling = _dangling_of(vid_vertices, vid_edges, "vid").persist()
    step = make_csr_step(blocks, routes, partitions)

    reset_vid = None
    if reset is not None:
        # entity space → vid space; weights on unknown ids drop, then
        # normalize over what remains (same contract as the join-agg path)
        reset_vid = reset.select(F.col(id_col).alias("entity"), "weight").join(
            hint(ids), "entity"
        )
        total = reset_vid.agg(F.sum("weight")).collect()[0][0]
        if not total or total <= 0:
            raise ValueError(
                "pagerank: reset distribution has no positive weight on any "
                "graph vertex (check ids and weights)"
            )
        reset_vid = (
            reset_vid.select("vid", (F.col("weight") / F.lit(float(total))).alias("reset_w"))
            .repartition(partitions, "vid")
            .persist()
        )

    try:
        res = _iterate(
            vid_vertices,
            "vid",
            step,
            dangling,
            n,
            nnz,
            damping=damping,
            tol=tol,
            max_iter=max_iter,
            fixed_iters=fixed_iters,
            partitions=partitions,
            checkpointer=checkpointer,
            reset=reset_vid,
        )
        entity_ranks = (
            res.ranks.join(ids, "vid").select(F.col("entity").alias(id_col), "pr")
        ).localCheckpoint(eager=True)
        return PageRankResult(
            ranks=entity_ranks,
            iterations=res.iterations,
            converged=res.converged,
            deltas=res.deltas,
            metrics=res.metrics,
        )
    finally:
        blocks.unpersist()
        routes.unpersist()
        dangling.unpersist()
        vid_vertices.unpersist()
        ids.unpersist()
        if reset_vid is not None:
            reset_vid.unpersist()
