"""Rank-vector comparison — the reference's differential-test comparator
(J4/A6 in SURVEY §2) as a first-class distributed operator.

The reference computes `max_i 2|a_i − b_i| / |a_i + b_i|` over two result
vectors (helper.c:119-141, threshold 1e-4 at verify_op.c:11,245-254). Here
the same metric — plus L1/L∞ absolute norms — is an equi-join on the
vertex id and one aggregate row, usable on billion-vertex rank tables
without collecting either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_rank_vectors(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str = "entity",
    value_col: str = "pr",
) -> dict[str, float]:
    """→ {max_rel_diff, l1, linf, n, n_missing}: full-vector comparison via
    a positional equi-join on the id (J4) + a max/sum reduce (A6).
    ``n_missing`` counts ids present in exactly one side (the reference
    assumes equal-length vectors; distributed tables can drift)."""
    left = a.select(F.col(id_col).alias("id"), F.col(value_col).alias("va"))
    right = b.select(F.col(id_col).alias("id"), F.col(value_col).alias("vb"))
    joined = left.join(right, "id", "full")
    row = joined.agg(
        F.max(
            F.when(
                F.col("va").isNotNull() & F.col("vb").isNotNull(),
                F.lit(2.0)
                * F.abs(F.col("va") - F.col("vb"))
                / F.greatest(F.abs(F.col("va") + F.col("vb")), F.lit(1e-300)),
            )
        ).alias("max_rel_diff"),
        F.sum(F.abs(F.coalesce("va", F.lit(0.0)) - F.coalesce("vb", F.lit(0.0)))).alias("l1"),
        F.max(F.abs(F.coalesce("va", F.lit(0.0)) - F.coalesce("vb", F.lit(0.0)))).alias("linf"),
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("va").isNull() | F.col("vb").isNull(), 1).otherwise(0)
        ).alias("n_missing"),
    ).collect()[0]
    return {
        "max_rel_diff": float(row.max_rel_diff) if row.max_rel_diff is not None else 0.0,
        "l1": float(row.l1 or 0.0),
        "linf": float(row.linf or 0.0),
        "n": int(row.n),
        "n_missing": int(row.n_missing or 0),
    }
