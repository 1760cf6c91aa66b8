"""DSIR importance weights — hashed n-gram log-likelihood ratios for
data selection (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

DSIR is the standard published recipe for picking pretraining data that
looks like a target domain: fit two bag-of-hashed-n-gram unigram models
(one on a small target corpus, one on the raw pool), score every raw
document by its log-likelihood ratio

    logw(d) = Σ_{features f of d}  ln p_target(bucket(f))
                                 − ln p_raw(bucket(f))

and resample ∝ exp(logw). Features are word unigrams + bigrams hashed
into ``dim`` buckets (the paper's construction); both distributions are
add-k smoothed over the FIXED bucket domain.

Engine composition: this operator produces the per-document scores;
selection composes with the existing samplers —
``sampling.weighted_reservoir_sample`` (fixed size) or
``sampling.weighted_hash_sample`` (fixed rate) on exp(logw / T) for a
chosen temperature, exactly the resampling step of the paper.

Scale shape (100 TB lens):
- Both model fits are groupBy over a key domain ≤ ``dim`` — the
  count-min posture: every partition collapses to ≤ dim rows map-side,
  hot features combine in the partial agg, model state is FIXED
  whatever the corpus (the paper's own point: hashing bounds the
  vocabulary).
- The model is a dim-row table — broadcast; the raw side collapses to
  per-(doc, bucket) counts (map-side combinable, fan-in bounded by
  dim per doc) BEFORE probing it, then one doc-keyed sum. The 100 TB
  side is never shuffled by the model.
- Everything is built-in ``pyspark.sql.functions`` over the portable
  polynomial hash, so every bucket count and log-ratio is reproduced
  term-for-term by the DuckDB twin (plans.oracle_sql_docs.docs_dsir_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import poly_hash_expr, tokens_expr


def _features(text: Column) -> Column:
    """Word unigrams + bigrams (array<string>, duplicates kept) — the
    paper's feature set; bigram construction mirrors quality._grams_all."""
    from .quality import _grams_all

    return F.concat(tokens_expr(text), _grams_all(text, 2))


def _bucket_counts(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    """→ (b int, cf long): hashed-feature histogram over ≤ dim buckets."""
    return (
        df.select(F.explode(_features(F.col(text_col))).alias("f"))
        .select((poly_hash_expr(F.col("f")) % F.lit(dim)).cast("int").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cf"))
    )


def dsir_logratios(
    documents: DataFrame,
    target: DataFrame,
    *,
    dim: int = 4096,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """→ (doc_id, n_feat long, logw double, logw_per_feat double), one
    row per input document: the DSIR importance log-weight of every
    ``documents`` row against the ``target`` corpus, with the feature
    count and the length-normalized per-feature ratio (useful when
    selection should not correlate with document length). Zero-feature
    documents score 0.0 with n_feat 0; floats ``round_to``-rounded.

    Model: per bucket b, lr(b) = ln((cf_t(b)+k)/(T_t+k·dim)) −
    ln((cf_r(b)+k)/(T_r+k·dim)) over the full dim-bucket domain,
    cf fit on target / documents respectively."""
    if dim <= 0:
        raise ValueError(f"dsir_logratios: dim must be positive, got {dim}")
    if k <= 0:
        raise ValueError(f"dsir_logratios: smoothing k must be > 0, got {k}")
    spark = documents.sparkSession

    cf_t = _bucket_counts(target, text_col, dim).withColumnRenamed("cf", "cf_t")
    # per-(doc, bucket) counts are computed ONCE and persisted: the raw
    # model histogram folds out of them (groupBy b — exact same counts),
    # so the expensive explode+poly-hash pass over the 100 TB side runs
    # once instead of twice (measured 1.5-2× at 250k docs); the persisted
    # frame is the collapsed bucket table (≤ dim rows per doc), not raw
    # features
    doc_feat = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_features(F.col(text_col))).alias("f"),
        )
        .select(
            "doc_id",
            (poly_hash_expr(F.col("f")) % F.lit(dim)).cast("int").alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    cf_r = doc_feat.groupBy("b").agg(F.sum("c").alias("cf_r"))
    tot = (
        cf_t.agg(F.coalesce(F.sum("cf_t"), F.lit(0)).alias("t_t"))
        .crossJoin(cf_r.agg(F.coalesce(F.sum("cf_r"), F.lit(0)).alias("t_r")))
    )
    full = spark.range(dim).select(F.col("id").cast("int").alias("b"))
    model = (
        full.join(cf_t, "b", "left")
        .join(cf_r, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("cf_t"), F.lit(0)) + F.lit(k))
                    / (F.col("t_t") + F.lit(k * dim))
                )
                - F.log(
                    (F.coalesce(F.col("cf_r"), F.lit(0)) + F.lit(k))
                    / (F.col("t_r") + F.lit(k * dim))
                )
            ).alias("lr"),
        )
    )
    # probe the model with the collapsed per-(doc, bucket) counts —
    # the join fans out ≤ dim rows per document, not one per occurrence
    scored = (
        doc_feat.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feat"),
            F.sum(F.col("c") * F.col("lr")).alias("logw"),
        )
    )
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feat"), F.lit(0)).cast("long").alias("n_feat"),
            F.round(F.coalesce(F.col("logw"), F.lit(0.0)), round_to).alias("logw"),
            F.round(
                F.when(
                    F.col("n_feat").isNotNull(),
                    F.col("logw") / F.col("n_feat"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("logw_per_feat"),
        )
    )
