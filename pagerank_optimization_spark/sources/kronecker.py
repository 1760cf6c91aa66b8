"""Stochastic Kronecker graph source — the reference's only generator
(pagerank.c:153-223), rebuilt distributed and DETERMINISTIC (the
reference seeds with time(NULL), pagerank.c:166 — its runs are not
reproducible; ours are).

Semantics reproduced exactly:
- cell probability P(i,j) = Π over base-2 digit pairs of the 2×2 seed
  density (recursive definition at pagerank.c:36-84). With a 2×2 seed the
  recursion has the closed form
      P(i,j) = s00^n00 · s01^n01 · s10^n10 · s11^n11
  where n_ab counts depth-many bit positions with (bit_a of i, bit_b of j)
  — computed with ``bit_count`` expressions, no recursion, no UDF;
- one Bernoulli draw per cell (multi-edges impossible), diagonal allowed
  (self-loops kept) — pagerank.c:180-208;
- entry (i, j) means edge j → i: SOURCE is the column (pagerank.c:125-135
  counts degree per column); we emit (src=j, dst=i) directly;
- default seed densities {0.91, 0.75, 0.63, 0.52} (verify_op.c:160-162).

Two sampling strategies behind one API (``kronecker_edges(method=...)``):

- ``exact``  — the reference's m² cell sweep, one Bernoulli draw per cell
  (pagerank.c:180-208). Fine to m ≤ 4096 (≤ 16M cells, one spark.range);
  O(m²) regardless of density, a non-starter at web scale.
- ``rmat``   — R-MAT ball-dropping (Chakrabarti-Zhan-Faloutsos, SDM'04):
  drop E = round((Σ seed)^depth) balls, each choosing a quadrant per
  recursion level with probabilities proportional to the seed densities;
  duplicates collapse (the Bernoulli model is 0/1). O(nnz · depth) work —
  the 100 TB generator path. Degree distributions match the exact sweep
  (KS-tested at m=1024, tests/test_kronecker.py).
- ``auto``   — exact for m ≤ 4096, rmat above.

Both are deterministic in (m, seed, densities): every random draw is an
xxhash64 of (ball id, level, seed) — no RNG state, identical output at
any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEED_DENSITIES = ((0.91, 0.75), (0.63, 0.52))

_U_BITS = 40
_U_MOD = 1 << _U_BITS


def kron_depth(m: int) -> int:
    """ceil(log2 m) — depth estimate of pagerank.c:69-80 for a 2×2 seed."""
    return max(1, int(math.ceil(math.log(m) / math.log(2) - 1e-9)))


def kron_probability_expr(i, j, m: int, densities=DEFAULT_SEED_DENSITIES):
    """P(i,j) as a closed-form column expression over bit-count aggregates."""
    d = kron_depth(m)
    mask = F.lit((1 << d) - 1)
    n11 = F.bit_count(i.bitwiseAND(j).bitwiseAND(mask))
    n10 = F.bit_count(i.bitwiseAND(j.bitwiseXOR(mask)).bitwiseAND(mask))
    n01 = F.bit_count(i.bitwiseXOR(mask).bitwiseAND(j).bitwiseAND(mask))
    n00 = F.lit(d) - n11 - n10 - n01
    s = densities
    return (
        F.pow(F.lit(s[0][0]), n00)
        * F.pow(F.lit(s[0][1]), n01)
        * F.pow(F.lit(s[1][0]), n10)
        * F.pow(F.lit(s[1][1]), n11)
    )


EXACT_SWEEP_MAX_M = 4096


def kronecker_edges(
    spark: SparkSession,
    m: int,
    *,
    seed: int = 42,
    densities=DEFAULT_SEED_DENSITIES,
    method: str = "auto",
) -> DataFrame:
    """→ edges(src long, dst long), emitted as (src=j, dst=i) per the
    reference's column→row edge convention. Deterministic in
    (m, seed, densities). ``method``: "exact" (m² Bernoulli sweep),
    "rmat" (O(nnz) ball-drop), or "auto" (exact ≤ {EXACT_SWEEP_MAX_M})."""
    if method == "auto":
        method = "exact" if m <= EXACT_SWEEP_MAX_M else "rmat"
    if method == "rmat":
        return rmat_edges(spark, m, seed=seed, densities=densities)
    if method != "exact":
        raise ValueError(f"unknown method {method!r}")
    cells = spark.range(m * m).select(
        (F.col("id") / m).cast("long").alias("i"),
        (F.col("id") % m).alias("j"),
    )
    u = (F.pmod(F.xxhash64("i", "j", F.lit(seed)), F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))
    p = kron_probability_expr(F.col("i"), F.col("j"), m, densities)
    return cells.filter(u < p).select(F.col("j").alias("src"), F.col("i").alias("dst"))


def rmat_edges(
    spark: SparkSession,
    m: int,
    *,
    seed: int = 42,
    densities=DEFAULT_SEED_DENSITIES,
    n_edges: int | None = None,
) -> DataFrame:
    """O(nnz) R-MAT sampler of the same Kronecker model: drop
    E = round((Σ seed)^depth) balls (the exact sweep's EXPECTED nnz),
    each recursing depth levels — at every level one hash-uniform draw
    picks the quadrant with probability s_ab / Σ seed, appending one bit
    to i and one to j. Duplicates collapse via distinct() (the Bernoulli
    model cannot emit multi-edges); cells ≥ m (non-power-of-two m) drop.

    Fully columnar: the per-level quadrant choice is a chain of depth
    hash+compare expressions inside one whole-stage-codegen'd projection —
    no UDF, no RNG state, deterministic at any parallelism."""
    d = kron_depth(m)
    (a, b), (c, dd) = densities
    total = a + b + c + dd
    if n_edges is None:
        n_edges = int(round(total**d))
    qa, qb, qc = a / total, b / total, c / total  # cum: [qa, qa+qb, qa+qb+qc, 1]
    balls = spark.range(n_edges)
    i = F.lit(0).cast("long")
    j = F.lit(0).cast("long")
    for lvl in range(d):
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(lvl), F.lit(seed)), F.lit(_U_MOD))
        ).cast("double") / F.lit(float(_U_MOD))
        # quadrant (bit_i, bit_j): 00 w.p. qa, 01 w.p. qb, 10 w.p. qc, 11 rest
        bit_i = F.when(u >= F.lit(qa + qb), F.lit(1)).otherwise(F.lit(0)).cast("long")
        bit_j = (
            F.when((u >= F.lit(qa)) & (u < F.lit(qa + qb)), F.lit(1))
            .when(u >= F.lit(qa + qb + qc), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        i = F.shiftleft(i, 1) + bit_i
        j = F.shiftleft(j, 1) + bit_j
    return (
        balls.select(i.alias("i"), j.alias("j"))
        .filter((F.col("i") < m) & (F.col("j") < m))
        .select(F.col("j").alias("src"), F.col("i").alias("dst"))
        .distinct()
    )


def kronecker_graph(
    spark: SparkSession,
    m: int,
    *,
    seed: int = 42,
    densities=DEFAULT_SEED_DENSITIES,
    method: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """→ (vertices(vid), weighted edges(src, dst, weight=1/outdeg(src))) —
    the full `initialize_multiformat_graph` pipeline (pagerank.c:279-305)
    on a Kronecker input, ready for the PageRank kernels (id_col='vid')."""
    edges = kronecker_edges(spark, m, seed=seed, densities=densities, method=method)
    vertices = spark.range(m).select(F.col("id").alias("vid"))
    # |V|-sized degree table: no broadcast hint (AQE decides by size)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    wedges = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("weight")
    )
    return vertices, wedges
