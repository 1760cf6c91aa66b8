"""BM25 ranked retrieval over the documents table.

Okapi BM25 (Robertson/Spärck Jones; the '+1' idf variant Lucene uses, so
idf is always positive) as a pure DataFrame plan — no UDFs anywhere, so
the whole score is one whole-stage-codegen'd expression tree and the plan
is DuckDB-oracle-checkable term for term.

Scale shape (the 100 TB lens): the postings explode is filtered to the
QUERY terms before any shuffle, so the per-query work after the scan is
O(matching postings), not O(corpus tokens) — for a handful of query terms
that is a tiny fraction of the corpus. The two corpus-wide statistics
(N, avgdl) are a single scan-and-aggregate producing one row, broadcast
by crossJoin; per-term document frequencies are an aggregate over the
already-filtered postings (≤ |terms| rows, broadcast into the score
join). One shuffle by (doc_id, term) for tf, one by doc_id for the final
score sum — both on keys that are high-cardinality and unskewed by
construction (a document repeats a term at most dl times).

Tokenization is the corpus-wide whitespace tokenizer shared with every
other docs operator (functions.text.tokens_expr ↔ the DuckDB twin's
list_filter(string_split_regex(...)) — parity established since round 2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_n`` documents by BM25 score for a bag of query terms.

    → (doc_id, score) ordered by (score desc, doc_id asc); ``score`` is
    rounded to ``round_to`` decimals BEFORE the ordering so the ranking is
    reproducible across engines (sum order over query terms is
    nondeterministic at the last ulp; rounding collapses it — the repo's
    standard float-parity convention).

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = sorted(set(query_terms))

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_expr(F.col(text_col)).alias("toks")
    )
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    # one corpus pass → one row (N, avgdl); crossJoin broadcasts it
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # postings restricted to query terms BEFORE the tf shuffle
    post = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        post.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), round_to).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_n)
