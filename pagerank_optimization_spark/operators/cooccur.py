"""Windowed token co-occurrence + PMI — the word-association statistic
that underlies count-based embeddings (Church & Hanks, "Word Association
Norms, Mutual Information, and Lexicography", 1990; PPMI-factorization
equivalence to skip-gram: Levy & Goldberg, NeurIPS 2014).

The reference engine has no text surface; this extends the engine the
same way BM25 (operators/retrieval.py) and the unigram LM (operators/
lm.py) do, sharing their tokenizer (functions.text.tokens_expr) so PMI
rows are consistent with vocab/LM/BM25 stats.

Model — the standard symmetric-window co-occurrence matrix:
- events: within a document, every token pair at positions (i, i+j) for
  j = 1..window;
- directed counts: each event (x, y) contributes to BOTH n(x→y) and
  n(y→x) (an (a, a) event therefore counts twice on the diagonal — the
  usual convention that keeps row marginals exact);
- marginals m(a) = Σ_b n(a→b); grand total N = Σ n = 2 × events;
- PMI(a, b) = ln( n(a→b) · N / (m(a) · m(b)) ).

Scale shape (the 100 TB lens):
- Pair generation is pure array algebra inside whole-stage codegen
  (slice + arrays_zip + explode — no Python, no self-join): cost is
  O(window · total_tokens) rows into ONE map-side-combinable hash agg.
- Hot pairs ("of the") collapse map-side exactly like vocab_topk's hot
  tokens; the marginal table is vocabulary-sized, joined twice (AQE
  picks broadcast when it fits).
- ``min_count`` prunes the long tail BEFORE the marginal joins — the
  classic sparsification that keeps the output near-linear in corpus
  size rather than O(vocab²).

Determinism: counts are exact integers; PMI is one ln() over an integer
ratio, rounded to ``round_to`` — cross-engine float noise is ~1e-15,
far below the rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def window_events(ts: DataFrame, window: int) -> DataFrame:
    """→ (x, y): one row per within-document token pair at positions
    (i, i+j), j = 1..window, from a one-column frame of token arrays
    ``ts``. Events at each offset j are zip(ts[1..L−j], ts[1+j..L]) —
    array algebra only (slice + arrays_zip + explode), one generated row
    per (position, offset), no join, no Python. Shared by pmi_pairs and
    textrank_keywords so their co-occurrence models are identical."""
    events = None
    for j in range(1, window + 1):
        n = F.greatest(F.size("ts") - F.lit(j), F.lit(0))
        pairs_j = ts.select(
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, n).alias("x"),
                    F.slice("ts", j + 1, n).alias("y"),
                )
            ).alias("p")
        ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        events = pairs_j if events is None else events.unionByName(pairs_j)
    return events


def pmi_pairs(
    docs: DataFrame,
    *,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """→ (a, b, pair_count, pmi) for canonical token pairs a ≤ b whose
    directed co-occurrence count within ``window`` is ≥ ``min_count``.

    ``pair_count`` is the DIRECTED count n(a→b) (= the number of window
    events for a ≠ b; 2× the events on the diagonal — see module
    docstring). PMI > 0 means the pair co-occurs more than independent
    unigram frequencies predict."""
    if window < 1:
        raise ValueError(f"pmi_pairs: window must be ≥ 1, got {window}")
    if min_count < 1:
        raise ValueError(f"pmi_pairs: min_count must be ≥ 1, got {min_count}")
    ts = docs.select(tokens_expr(F.col(text_col)).alias("ts"))
    events = window_events(ts, window)

    directed = events.select(F.col("x").alias("a"), F.col("y").alias("b")).unionByName(
        events.select(F.col("y").alias("a"), F.col("x").alias("b"))
    )
    nd = directed.groupBy("a", "b").agg(F.count("*").alias("pair_count"))
    marg = nd.groupBy("a").agg(F.sum("pair_count").alias("m"))
    tot = nd.agg(F.sum("pair_count").alias("n_tot"))

    return (
        nd.filter((F.col("a") <= F.col("b")) & (F.col("pair_count") >= min_count))
        .join(marg.select(F.col("a"), F.col("m").alias("m_a")), "a")
        .join(marg.select(F.col("a").alias("b"), F.col("m").alias("m_b")), "b")
        .crossJoin(tot)
        .select(
            "a",
            "b",
            "pair_count",
            F.round(
                F.log(
                    F.col("pair_count").cast("double")
                    * F.col("n_tot")
                    / (F.col("m_a") * F.col("m_b"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
