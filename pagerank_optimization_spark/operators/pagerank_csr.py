"""Vectorized CSR-blocks PageRank kernel (the north-star physical design).

The reference's fastest variants rebuild the COO edge list into CSR via a
counting sort (histogram + exclusive prefix-sum + stable scatter,
tuned_variant_csr.c:179-229) so each output cell is one contiguous row
segment (tuned_variant_csr.c:72-84), then vectorize the gather with AVX2
`_mm256_i32gather_ps` (tuned_variant_simd.c:297-300) and reduce each
segment with an 8-lane horizontal sum (tuned_variant_simd.c:244-269).

The Spark-native rebuild of that layout:

- vertex ids are hashed into P buckets by ``src % P``; each bucket's edges
  are compiled ONCE into a numpy CSR block — destinations counting-sorted
  (np.argsort stable ≡ the reference's histogram+scatter), an ``indptr``
  built from run lengths, the source index pre-localized to the bucket's
  dense rank-slice coordinates;
- blocks are stored as binary cells of one P-row DataFrame and cached —
  the DISTRIBUTE_DATA moment (tuned_variant_baseline.c:247-324): layout is
  decided once and reused every superstep;
- per superstep, the rank vector (bucketed the same way) is cogrouped with
  its block inside ``applyInPandas``; the gather `x[src_idx]` is numpy
  fancy indexing (the `i32gather` analog for a whole Arrow batch, not 8
  lanes), the per-destination segment sum is ``np.add.reduceat`` over
  ``indptr`` (the CSR row-segment sum, tuned_variant_csr.c:74-84);
- partial per-bucket sums are combined by a global groupBy(dst).sum —
  Spark's partial+final agg (the OpenMP array-reduction analog,
  tuned_variant_openmp.c:75-77).

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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pagerank_optimization_spark.operators.graph_build import vertex_ids

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
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
    """Compile (src, dst, weight) vid-space edges into P cached CSR blocks.

    Inside each bucket (src % P): stable-sort edges by dst (the counting
    sort of tuned_variant_csr.c:179-229 — np.argsort(kind='stable') over a
    bounded key is the same algorithm), emit indptr over the dst runs, and
    pre-localize src to the bucket's dense rank-slice coordinate
    (src - bucket) / P so the per-superstep gather needs no hash lookup.
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
        src_idx = (src - b) // P
        return pd.DataFrame(
            {
                "bucket": [b],
                "src_idx": [src_idx.tobytes()],
                "indptr": [indptr.tobytes()],
                "dst_vid": [dst_unique.tobytes()],
                "weight": [w.tobytes()],
            }
        )

    return (
        vid_edges.withColumn("bucket", F.pmod(F.col("src"), F.lit(P)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(compile_block, schema=BLOCK_SCHEMA)
    )


def make_csr_step(blocks: DataFrame, n_buckets: int):
    """Returns step_fn(ranks_vid_df) -> contribs(vid, contrib) using the
    cached CSR blocks. ranks must have columns (vid, pr)."""
    P = n_buckets

    def spmv(key, block_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or ranks_pdf.empty:
            return pd.DataFrame({"vid": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="float64")})
        b = int(key[0])
        src_idx = np.frombuffer(block_pdf["src_idx"].iloc[0], dtype=np.int64)
        indptr = np.frombuffer(block_pdf["indptr"].iloc[0], dtype=np.int64)
        dst_vid = np.frombuffer(block_pdf["dst_vid"].iloc[0], dtype=np.int64)
        w = np.frombuffer(block_pdf["weight"].iloc[0], dtype=np.float64)
        vids = ranks_pdf["vid"].to_numpy(dtype=np.int64)
        pr = ranks_pdf["pr"].to_numpy(dtype=np.float64)
        # dense local rank slice: position (vid - b) / P
        x = np.zeros(int(src_idx.max()) + 1 if len(src_idx) else 0, dtype=np.float64)
        pos = (vids - b) // P
        keep = pos < len(x)
        x[pos[keep]] = pr[keep]
        contrib = w * x[src_idx]                      # vectorized gather+mul
        sums = np.add.reduceat(contrib, indptr[:-1])  # CSR segment sum
        return pd.DataFrame({"vid": dst_vid, "contrib": sums})

    def step(ranks: DataFrame) -> DataFrame:
        bucketed = ranks.withColumn("bucket", F.pmod(F.col("vid"), F.lit(P)).cast("int"))
        partials = (
            blocks.groupBy("bucket")
            .cogroup(bucketed.groupBy("bucket"))
            .applyInPandas(spmv, schema=CONTRIB_SCHEMA)
        )
        return partials.groupBy("vid").agg(F.sum("contrib").alias("contrib"))

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
    checkpointer=None,
):
    """CSR-blocks kernel entry (called via pagerank(kernel='csr-blocks')).

    Runs the superstep loop in dense vid space, then maps ranks back to
    entities; the result is column-identical to the join-agg kernel
    (cross-kernel differential bar: 1e-12, SURVEY.md §5 item 3).
    """
    from pagerank_optimization_spark.operators.pagerank import PageRankResult, _dangling_of, _iterate

    # normalize the external id column to 'entity' for the vid mapping
    # (works for string entities and for already-numeric ids alike)
    ids = vertex_ids(vertices.select(F.col(id_col).alias("entity"))).persist()
    n = ids.count()
    if n == 0:
        raise ValueError("pagerank: empty vertex set (no entities derivable from input)")

    src_ids = ids.select(F.col("entity").alias("src"), F.col("vid").alias("src_vid"))
    dst_ids = ids.select(F.col("entity").alias("dst"), F.col("vid").alias("dst_vid"))
    vid_edges = (
        edges.join(F.broadcast(src_ids), "src")
        .join(F.broadcast(dst_ids), "dst")
        .select(F.col("src_vid").alias("src"), F.col("dst_vid").alias("dst"), "weight")
    )
    blocks = build_csr_blocks(vid_edges, partitions).persist()
    blocks.count()
    nnz = vid_edges.count()

    vid_vertices = ids.select("vid").repartition(partitions, "vid").persist()
    dangling = _dangling_of(vid_vertices, vid_edges, "vid").persist()
    step = make_csr_step(blocks, partitions)

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
        dangling.unpersist()
        ids.unpersist()
