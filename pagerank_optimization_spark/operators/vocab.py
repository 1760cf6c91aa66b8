"""Vocabulary statistics for tokenizer training: corpus-wide token
collection frequency (cf) and document frequency (df), top-N.

Training a tokenizer (BPE/unigram) over a 100 TB corpus starts from
exactly this table — the token histogram — and corpus audits read the
same stats (head tokens, vocabulary growth, df/cf ratios for stopword
discovery). The reference engine has no text surface; this extends the
engine the same way BM25 (operators/retrieval.py) does, sharing its
tokenization (functions.text.tokens_expr) so vocab rows are consistent
with every other text operator.

Scale notes (100 TB lens):
- The token histogram is the textbook skewed aggregation ("the" carries
  ~5% of all occurrences), but both aggregates are map-side-combinable:
  ``count(*)`` partials directly, and Spark plans ``count(distinct
  doc_id)`` as a two-phase agg keyed on (token, doc_id) — the hot
  token's partials are spread across its distinct doc_ids, so no single
  task ever sees the full "the" row stream. No salting needed: partial
  aggregation IS the skew defense for algebraic aggregates.
- Top-N is ``orderBy().limit(n)`` → Spark's TakeOrderedAndProject:
  per-partition heaps of n rows + one driver merge, never a global sort
  shuffle.
- The final rank is a window over n rows (the already-collected top-N),
  not over the vocabulary.

Deterministic contract: ties broken by (cf DESC, token ASC) everywhere —
the same total order in the heap, the limit, and the rank — so the
result is reproducible and oracle-checkable row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def vocab_topk(
    documents: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ DataFrame(token, cf, df, rank): the ``n`` most frequent tokens
    with collection frequency (total occurrences) and document frequency
    (distinct documents), ranked by (cf DESC, token ASC)."""
    if n <= 0:
        raise ValueError(f"vocab_topk: n must be positive, got {n}")
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("token"),
    )
    stats = toks.groupBy("token").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = stats.orderBy(F.desc("cf"), F.asc("token")).limit(n)
    # rank over the n surviving rows only — a single tiny partition by
    # construction, never the full vocabulary
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("cf"), F.asc("token")))
    )
