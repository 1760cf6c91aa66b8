"""Kronecker source tests: the closed-form probability matches a direct
python port of the reference's recursive definition (pagerank.c:36-84),
the graph is deterministic and power-law-skewed, and the PageRank kernels
reproduce the numpy oracle on a Kronecker input — the reference's own
verify run (verify_op.c:133-254) with reproducibility fixed."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.sources.kronecker import (
    DEFAULT_SEED_DENSITIES,
    kron_depth,
    kron_probability_expr,
    kronecker_edges,
    kronecker_graph,
)


def py_kron_value(depth, i, j, s=DEFAULT_SEED_DENSITIES):
    """Direct port of get_kron_value_backend (pagerank.c:36-67)."""
    if depth == 0:
        return 1.0
    half = 2 ** (depth - 1)
    return s[i // half][j // half] * py_kron_value(depth - 1, i % half, j % half, s)


def test_probability_matches_reference_recursion(spark):
    m = 64
    d = kron_depth(m)
    cells = spark.range(m * m).select(
        (F.col("id") / m).cast("long").alias("i"), (F.col("id") % m).alias("j")
    )
    got = {
        (r.i, r.j): r.p
        for r in cells.select("i", "j", kron_probability_expr(F.col("i"), F.col("j"), m).alias("p")).collect()
    }
    for i in range(0, m, 7):
        for j in range(0, m, 5):
            assert abs(got[(i, j)] - py_kron_value(d, i, j)) < 1e-12


def test_generator_deterministic_and_skewed(spark):
    a = sorted((r.src, r.dst) for r in kronecker_edges(spark, 128, seed=1).collect())
    b = sorted((r.src, r.dst) for r in kronecker_edges(spark, 128, seed=1).collect())
    assert a == b
    c = sorted((r.src, r.dst) for r in kronecker_edges(spark, 128, seed=2).collect())
    assert a != c
    # edge count close to expected Σ P(i,j) = (Σ seed)^depth
    expected = sum(sum(row) for row in DEFAULT_SEED_DENSITIES) ** kron_depth(128)
    assert abs(len(a) - expected) / expected < 0.05
    # power-law: expected outdeg of column j is (0.91+0.63)^(zeros in j) ×
    # (0.75+0.52)^(ones in j) — low-popcount vertices are the hubs
    outdeg = {}
    for s, d_ in a:
        outdeg[s] = outdeg.get(s, 0) + 1
    low = [outdeg.get(v, 0) for v in range(128) if bin(v).count("1") <= 1]
    high = [outdeg.get(v, 0) for v in range(128) if bin(v).count("1") >= 6]
    assert sum(low) / len(low) > 2 * (sum(high) / len(high) + 0.1)


def test_pagerank_on_kronecker_matches_numpy(spark):
    m = 128
    vertices, wedges = kronecker_graph(spark, m, seed=7)
    edge_rows = wedges.select("src", "dst").collect()
    # numpy oracle on the SAME edge list (float64 dense power iteration)
    A = np.zeros((m, m))
    outdeg = np.zeros(m, dtype=np.int64)
    for r in edge_rows:
        outdeg[r.src] += 1
    for r in edge_rows:
        A[r.dst, r.src] = 1.0 / outdeg[r.src]
    x = np.full(m, 1.0 / m)
    dangling = outdeg == 0
    d = 0.85
    for _ in range(10):
        x = (1 - d) / m + d * (A @ x + x[dangling].sum() / m)
    res = pagerank(vertices, wedges, id_col="vid", fixed_iters=10, partitions=8)
    got = {r.vid: r.pr for r in res.ranks.collect()}
    g = np.array([got[v] for v in range(m)])
    assert np.allclose(g, x, atol=1e-12)
    # and the vectorized kernel agrees on the same input
    res_csr = pagerank(vertices, wedges, id_col="vid", fixed_iters=10, partitions=8, kernel="csr-blocks")
    got_csr = {r.vid: r.pr for r in res_csr.ranks.collect()}
    g2 = np.array([got_csr[v] for v in range(m)])
    assert np.allclose(g, g2, atol=1e-12)


def _sorted_degrees(df, key, m):
    rows = df.groupBy(key).count().collect()
    d = np.zeros(m)
    for r in rows:
        d[r[key]] = r["count"]
    return np.sort(d)


def _ks(x, y):
    allv = np.unique(np.concatenate([x, y]))
    return float(np.max(np.abs(
        np.searchsorted(x, allv, side="right") / len(x)
        - np.searchsorted(y, allv, side="right") / len(y)
    )))


def test_rmat_degree_distribution_matches_exact_sweep(spark):
    """R-MAT ball-drop vs the m² Bernoulli sweep at m=1024: same Kronecker
    model, so the degree-sequence KS statistic must be small (measured
    0.039 out / 0.021 in; bound 0.08 with margin). This is the evidence
    that the O(nnz) generator can replace the O(m²) sweep above the
    EXACT_SWEEP_MAX_M cutoff."""
    from pagerank_optimization_spark.sources.kronecker import rmat_edges

    m = 1024
    exact = kronecker_edges(spark, m, seed=42, method="exact")
    rmat = rmat_edges(spark, m, seed=42)
    n_ex, n_rm = exact.count(), rmat.count()
    assert abs(n_rm - n_ex) / n_ex < 0.05  # expected-nnz calibration
    assert _ks(_sorted_degrees(exact, "src", m), _sorted_degrees(rmat, "src", m)) < 0.08
    assert _ks(_sorted_degrees(exact, "dst", m), _sorted_degrees(rmat, "dst", m)) < 0.08


def test_rmat_deterministic_and_auto_dispatch(spark):
    from pagerank_optimization_spark.sources.kronecker import EXACT_SWEEP_MAX_M, rmat_edges

    a = rmat_edges(spark, 256, seed=9).collect()
    b = rmat_edges(spark, 256, seed=9).collect()
    assert sorted(a) == sorted(b)
    # auto dispatch: small m → exact (equals method="exact" output)
    ex = kronecker_edges(spark, 256, seed=9, method="exact").collect()
    au = kronecker_edges(spark, 256, seed=9, method="auto").collect()
    assert sorted(ex) == sorted(au)
    assert EXACT_SWEEP_MAX_M == 4096
