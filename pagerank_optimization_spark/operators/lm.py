"""Unigram language-model corpus scoring — the CCNet-style perplexity
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", 2020) reduced to its distributable core:
train token frequencies on a (sub)corpus, score every document by its
mean token log-probability, keep/bucket documents by the score.

The reference engine has no text surface; this extends the engine the
same way BM25 (operators/retrieval.py) does and shares its tokenizer
(functions.text.tokens_expr) so LM rows are consistent with vocab/BM25/
quality stats. Pure ``pyspark.sql.functions`` throughout — the score is
one whole-stage-codegen'd expression tree, no Python in the hot path,
and the whole plan has a term-for-term DuckDB twin
(plans/oracle_sql_docs.docs_lm_score_sql).

Model: add-k smoothed unigram LM over the training slice.

    logp(t) = ln( (cf(t) + k) / (T + k·(V + 1)) )
    OOV     = ln(       k     / (T + k·(V + 1)) )   (the "+1" is the OOV cell)
    score(d)= Σ_t tf(d,t)·logp(t) / n_tok(d)
    bits/token = −score(d) / ln 2

Scale shape (the 100 TB lens):
- Two shuffles total: (doc_id, token) tf aggregation and the final
  per-doc sum — both map-side-combinable hash aggs; the token histogram
  is the same skewed-but-partial-agg-safe shape as vocab_topk (hot
  tokens combine map-side; no single task sees all "the" rows).
- The tf⋈vocab join probes one row per DISTINCT (doc, token), not per
  occurrence, so the hot-token fan-in is already collapsed before the
  join; residual skew is AQE skew-join territory.
- ``vocab_limit`` is the production knob: truncate the LM to the top-N
  tokens (everything else scores as OOV). A fixed-size model is exactly
  what CCNet does (a pretrained LM), makes the vocab side broadcastable,
  and bounds model state independently of corpus size. The driver query
  runs untruncated for oracle parity; tests pin the truncated path.
- Corpus scalars (T, V) ride a one-row aggregate crossJoined in — the
  bm25 N/avgdl pattern, no driver round-trip.

Determinism: the per-doc sum runs over distinct tokens in shuffle order;
floats are rounded to ``round_to`` decimals at the end (the repo's
standard float-parity convention, see bm25_topk).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def unigram_lm_scores(
    docs: DataFrame,
    *,
    k: float = 0.5,
    vocab_limit: int | None = None,
    train_filter=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Score every document under an add-``k`` unigram LM trained on
    ``train_filter(docs)`` (default: the whole corpus — self-scoring,
    the standard corpus-audit mode).

    → (doc_id, n_tok, avg_logp, bits_per_token), one row per input
    document (empty documents score 0.0 with n_tok 0), floats rounded to
    ``round_to``.

    ``vocab_limit``: keep only the top-N training tokens by
    (cf DESC, token ASC); everything else scores as OOV. Bounds model
    size at scale (see module docstring)."""
    if k <= 0:
        raise ValueError(f"unigram_lm_scores: smoothing k must be > 0, got {k}")
    ids = docs.select(F.col(id_col).alias("doc_id"))

    # per-(doc, token) term frequency — one map-side-combinable agg;
    # every downstream join probes this collapsed table, never raw tokens
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_expr(F.col(text_col))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )

    train = docs if train_filter is None else train_filter(docs)
    cf = (
        train.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cf"))
    )
    if vocab_limit is not None:
        if vocab_limit <= 0:
            raise ValueError(
                f"unigram_lm_scores: vocab_limit must be positive, got {vocab_limit}"
            )
        # TakeOrderedAndProject (per-partition heaps), never a global sort
        cf = cf.orderBy(F.desc("cf"), F.asc("token")).limit(vocab_limit)

    # corpus scalars as a one-row crossJoin (bm25's N/avgdl pattern);
    # T and V are over the (possibly truncated) model vocabulary
    totals = cf.agg(
        F.sum("cf").alias("lm_t"), F.count("*").alias("lm_v")
    )

    denom = F.col("lm_t") + F.lit(k) * (F.col("lm_v") + F.lit(1.0))
    scored = (
        tf.join(cf, "token", "left")  # left: OOV under vocab_limit/train_filter
        .crossJoin(totals)
        .withColumn(
            "logp", F.log((F.coalesce(F.col("cf"), F.lit(0.0)) + F.lit(k)) / denom)
        )
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            (F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias("avg_logp"),
        )
    )
    return (
        ids.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tok"), F.lit(0)).cast("long").alias("n_tok"),
            F.round(F.coalesce(F.col("avg_logp"), F.lit(0.0)), round_to).alias(
                "avg_logp"
            ),
            F.round(
                -F.coalesce(F.col("avg_logp"), F.lit(0.0)) / F.lit(math.log(2.0)),
                round_to,
            ).alias("bits_per_token"),
        )
    )
