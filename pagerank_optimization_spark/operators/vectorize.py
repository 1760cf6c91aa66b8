"""Text vectorization via the hashing trick: fixed-dimension TF-IDF
vectors with no vocabulary table — the feature-hashing construction
(Weinberger et al. 2009) every large-scale text system uses when a
learned embedding model is not in the loop.

vec_d[b] = Σ_{tokens t of d with bucket(t) = b}  tf(t, d) · idf(t),
idf(t) = ln((N + 1)/(df(t) + 1)) + 1  (smoothed), bucket(t) = the
portable polynomial hash mod dim — so the whole construction is
engine-portable and DuckDB-oracle-checkable cell by cell.

This closes the text → vector → ANN loop inside the engine: the output
``array<double>`` column feeds operators.similarity (cosine top-k, LSH,
IVF) directly, giving the corpus a similarity surface without external
embedding models.

Scale notes (100 TB lens): two map-side-combinable aggregations
(per-doc tf, corpus df — the same skew posture as vocab_topk: partial
aggregation absorbs hot tokens) + one broadcast of the 1-row corpus
count + one join on token (df lookup; hot tokens are a value-lookup,
fanout 1 per tf row) + one per-doc assembly. No vocabulary
materialization, no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import poly_hash_expr, tokens_expr


def hashed_tfidf(
    documents: DataFrame,
    dim: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, vector array<double> of length ``dim``): smoothed
    TF-IDF, feature-hashed into ``dim`` buckets with the portable hash.
    Documents with zero tokens get the zero vector."""
    if dim <= 0:
        raise ValueError(f"hashed_tfidf: dim must be positive, got {dim}")
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = documents.agg(F.count("*").cast("double").alias("n"))
    feat = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (poly_hash_expr(F.col("tok")) % F.lit(dim)).cast("int").alias("bucket"),
            (
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
            ).alias("w"),
        )
    )
    cells = feat.groupBy("doc_id", "bucket").agg(F.sum("w").alias("w"))
    assembled = cells.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "w"))).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("int")], F.lit(0.0)),
    )
    dense = assembled.select("doc_id", vec.alias("vector"))
    # zero-token docs never reach `cells`; restore them with zero vectors
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0.0))
    empty = (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(dense.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", zeros.alias("vector"))
    )
    return dense.unionByName(empty)


def quantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 8,
) -> DataFrame:
    """Int8 symmetric scalar quantization audit — the compression step an
    ANN index applies before sharding (4× memory over float32, ~16× over
    the float64 compute form), reported as per-vector reconstruction
    error so a pipeline can gate quantization on measured loss:

        scale = max_i |x_i| / 127
        q_i   = floor(x_i / scale + 0.5)   (explicit half-up — Spark's
                round() is HALF_UP but DuckDB's is banker's, so the twin
                pins the tie rule arithmetically instead)
        err_i = x_i − q_i · scale

    → (vec_id, scale, mse, linf), one row per vector; all-zero vectors
    short-circuit to zeros (identical CASE guard on both sides).

    Scale shape: pure per-row array expressions (transform/aggregate)
    inside whole-stage codegen — zero shuffles, composes with the scan."""
    e = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(
        F.transform(e, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    v = emb.select(
        F.col(id_col).alias("vec_id"), e.alias("e"), (amax / F.lit(127.0)).alias("scale")
    )
    er = v.select(
        "vec_id",
        "scale",
        F.when(
            F.col("scale") == 0, F.transform("e", lambda x: F.lit(0.0))
        ).otherwise(
            F.transform(
                "e",
                lambda x: x - F.floor(x / F.col("scale") + F.lit(0.5)) * F.col("scale"),
            )
        ).alias("er"),
        F.size("e").alias("d"),
    )
    return er.select(
        "vec_id",
        F.round("scale", round_to).alias("scale"),
        F.round(
            F.aggregate("er", F.lit(0.0), lambda a, x: a + x * x) / F.col("d"),
            round_to,
        ).alias("mse"),
        F.round(
            F.aggregate("er", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))),
            round_to,
        ).alias("linf"),
    )
