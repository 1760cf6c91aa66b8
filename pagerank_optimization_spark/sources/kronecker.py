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

The m² cell sweep matches the reference and is fine for parity testing
(m ≤ 4096 ⇒ ≤ 16M cells, a single spark.range). At web scale one would
switch to R-MAT ball-dropping (sample nnz edges by recursive quadrant
choice) — same distribution, O(nnz) work; noted, not needed here.
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


def kronecker_edges(
    spark: SparkSession,
    m: int,
    *,
    seed: int = 42,
    densities=DEFAULT_SEED_DENSITIES,
) -> DataFrame:
    """→ edges(src long, dst long): one Bernoulli(P(i,j)) draw per cell of
    the m×m adjacency, emitted as (src=j, dst=i) per the reference's
    column→row edge convention. Deterministic in (m, seed, densities)."""
    cells = spark.range(m * m).select(
        (F.col("id") / m).cast("long").alias("i"),
        (F.col("id") % m).alias("j"),
    )
    u = (F.pmod(F.xxhash64("i", "j", F.lit(seed)), F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))
    p = kron_probability_expr(F.col("i"), F.col("j"), m, densities)
    return cells.filter(u < p).select(F.col("j").alias("src"), F.col("i").alias("dst"))


def kronecker_graph(
    spark: SparkSession, m: int, *, seed: int = 42, densities=DEFAULT_SEED_DENSITIES
) -> tuple[DataFrame, DataFrame]:
    """→ (vertices(vid), weighted edges(src, dst, weight=1/outdeg(src))) —
    the full `initialize_multiformat_graph` pipeline (pagerank.c:279-305)
    on a Kronecker input, ready for the PageRank kernels (id_col='vid')."""
    edges = kronecker_edges(spark, m, seed=seed, densities=densities)
    vertices = spark.range(m).select(F.col("id").alias("vid"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    wedges = edges.join(F.broadcast(outdeg), "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("weight")
    )
    return vertices, wedges
