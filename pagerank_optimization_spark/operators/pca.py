"""Distributed PCA over an embedding column — covariance accumulation +
power iteration for the top principal component (the whitening /
dimensionality-audit primitive of an embedding pipeline; power method:
Golub & Van Loan §7.3).

Two covariance paths, one contract (→ (i, j, cov), population
covariance, 0-based positions):

- ``method="explode"`` (oracle path): two chained posexplodes emit
  n·d² (i, vi, j, vj) rows into ONE map-side-combinable hash agg —
  term-for-term twinnable in SQL (self-join on vec_id in the DuckDB
  twin). Exact, but the row blowup is d× the corpus per explode: right
  for oracle-scale checks and d ≲ 100.
- ``method="gram"`` (scale path): Arrow-batched ``mapInPandas`` — each
  batch contributes ONE d×d partial Gram matrix (numpy X·Xᵀ, d² rows
  per BATCH, not per vector), summed by the same hash agg. The shuffle
  volume is P·d² regardless of corpus size — the correct 100 TB shape
  (this is how every distributed PCA actually accumulates covariance).
  Differential-tested ≡ explode at 1e-9.

Power iteration runs ON DataFrames (the d×d covariance joined against a
d-row vector, k fixed matvec+normalize steps) so the whole query — not
just the covariance — has an unrolled SQL twin. x0 = 1/√d (uniform
positive start: the sign of the converged component is pinned by the
arithmetic, not by a random draw, so both engines land on the same
orientation).

Determinism: float sums in shuffle order — rounded to ``round_to`` at
the end (the repo's standard float-parity convention; 3 matvecs keep
cross-engine noise ~1e-13, far below 6 decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    method: str = "explode",
) -> DataFrame:
    """→ (i, j, cov): population covariance E[x_i x_j] − E[x_i]E[x_j]
    of the embedding coordinates (0-based positions, full d×d grid)."""
    if method not in ("explode", "gram"):
        raise ValueError(f"embedding_covariance: unknown method {method!r}")
    v = emb.select(F.col(vec_col).cast("array<double>").alias("e"))
    n = v.agg(F.count("*").cast("double").alias("n"))

    if method == "explode":
        # chained generators: n·d rows, then ×d — no join, one hash agg
        cells = v.select(F.posexplode("e").alias("i", "vi"), F.col("e")).select(
            "i", "vi", F.posexplode("e").alias("j", "vj")
        )
        sums = cells.groupBy("i", "j").agg(
            F.sum(F.col("vi") * F.col("vj")).alias("sxy"),
            F.sum("vi").alias("sx"),
            F.sum("vj").alias("sy"),
        )
    else:
        import pandas as pd  # noqa: PLC0415

        def _partial_gram(batches):
            import numpy as np  # noqa: PLC0415

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.stack(pdf["e"].to_numpy())  # (b, d) float64
                g = x.T @ x  # (d, d)
                s = x.sum(axis=0)  # (d,)
                d = g.shape[0]
                ii, jj = np.indices((d, d))
                yield pd.DataFrame(
                    {
                        "i": ii.ravel().astype("int32"),
                        "j": jj.ravel().astype("int32"),
                        "sxy": g.ravel(),
                        "sx": np.repeat(s, d),
                        "sy": np.tile(s, d),
                    }
                )

        partials = v.mapInPandas(
            _partial_gram, "i int, j int, sxy double, sx double, sy double"
        )
        sums = partials.groupBy("i", "j").agg(
            F.sum("sxy").alias("sxy"), F.sum("sx").alias("sx"), F.sum("sy").alias("sy")
        )

    return sums.crossJoin(n).select(
        "i",
        "j",
        (
            F.col("sxy") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("cov"),
    )


def pca_top_component(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    iters: int = 3,
    method: str = "explode",
    round_to: int = 6,
) -> DataFrame:
    """→ (pos, loading): the top principal component after ``iters``
    power-iteration steps from x0 = 1/√d, L2-normalized each step.
    Fixed-iters — the oracle mode (the twin unrolls the same steps);
    production runs pick iters by the λ1/λ2 gap they need."""
    if iters < 1:
        raise ValueError(f"pca_top_component: iters must be ≥ 1, got {iters}")
    cov = embedding_covariance(emb, vec_col=vec_col, method=method).persist()
    d = cov.agg((F.max("i") + 1).alias("d"))
    x = cov.select(F.col("i").alias("pos")).distinct().crossJoin(d).select(
        "pos", (F.lit(1.0) / F.sqrt(F.col("d"))).alias("xv")
    )
    for _ in range(iters):
        y = (
            cov.join(x.select(F.col("pos").alias("j"), "xv"), "j")
            .groupBy(F.col("i").alias("pos"))
            .agg(F.sum(F.col("cov") * F.col("xv")).alias("yv"))
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("yv") * F.col("yv"))).alias("nrm"))
        x = y.crossJoin(nrm).select("pos", (F.col("yv") / F.col("nrm")).alias("xv"))
        # d-row frame: checkpoint keeps the k-step plan flat (walks.py precedent)
        x = x.localCheckpoint(eager=False)
    out = x.select("pos", F.round("xv", round_to).alias("loading"))
    out = out.localCheckpoint(eager=True)
    cov.unpersist()
    return out
