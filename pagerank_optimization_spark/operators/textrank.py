"""TextRank keyword scoring — Mihalcea & Tarau (EMNLP 2004): run the
engine's OWN PageRank kernel over the token co-occurrence graph, so
"important words" are the stationary-walk winners exactly like important
pages. This is the flagship operator (the reference's power-iteration
SpMV, tuned_variant_baseline.c:107-148, via operators.pagerank) pointed
at the text side of the engine — the text ⇄ graph bridge in the
direction vectorize.py (text → vector) doesn't cover.

Graph model (shared with operators.cooccur so PMI and TextRank agree on
what "co-occurs" means — same tokenizer, same symmetric window events):
vertices are tokens incident to a kept edge; edges are the DISTINCT
directed pairs (both directions of every window event — the symmetric
graph TextRank prescribes) whose directed count ≥ ``min_count``; weights
are the engine's standard 1/outdeg column-stochastic normalization
(graph_build.normalize_edges). Dedup-to-0/1 edges matches the engine's
transcript-graph convention.

Scale shape: pair generation is the cooccur array-algebra path (no
self-join, whole-stage codegen), the count filter prunes the long tail
BEFORE graph construction (the min_count sparsification keeps |E| near-
linear in corpus size), and everything after is the PageRank kernel's
cost envelope — one frontier shuffle per superstep, kernel-dispatched by
resolve_auto_kernel like every other PageRank call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from .cooccur import window_events
from .graph_build import normalize_edges
from .pagerank import pagerank


def textrank_keywords(
    docs: DataFrame,
    *,
    window: int = 2,
    min_count: int = 3,
    k0: int = 10,
    text_col: str = "text",
    partitions: int | None = None,
    round_to: int = 8,
) -> DataFrame:
    """→ (token, pr): damped PageRank (k0 fixed supersteps, uniform x0,
    dangling redistribution — the engine defaults) over the token
    co-occurrence graph. Raises if no token pair survives ``min_count``
    (an empty graph has no stationary distribution to report)."""
    if window < 1:
        raise ValueError(f"textrank_keywords: window must be ≥ 1, got {window}")
    if min_count < 1:
        raise ValueError(f"textrank_keywords: min_count must be ≥ 1, got {min_count}")
    ts = docs.select(tokens_expr(F.col(text_col)).alias("ts"))
    events = window_events(ts, window)
    directed = events.select(F.col("x").alias("a"), F.col("y").alias("b")).unionByName(
        events.select(F.col("y").alias("a"), F.col("x").alias("b"))
    )
    kept = (
        directed.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter((F.col("a") != F.col("b")) & (F.col("pair_count") >= min_count))
    )
    edges = kept.select(F.col("a").alias("src"), F.col("b").alias("dst")).persist()
    # FULL count, not limit(1): the emptiness probe must also materialize
    # the whole edge cache, or every downstream setup action (outdeg join,
    # x0 build, dangling probe) partially re-derives the corpus-sized
    # window-event lineage — measured 62.6s → 25.7s at sf0.1 (5k docs)
    if edges.count() == 0:
        edges.unpersist()
        raise ValueError(
            f"textrank_keywords: no token pair reaches min_count={min_count} "
            "— the co-occurrence graph is empty"
        )
    vertices = (
        edges.select(F.col("src").alias("entity"))
        .union(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .persist()
    )
    vertices.count()
    res = pagerank(vertices, normalize_edges(edges), fixed_iters=k0, partitions=partitions)
    out = res.ranks.select(
        F.col("entity").alias("token"), F.round("pr", round_to).alias("pr")
    )
    edges.unpersist(), vertices.unpersist()
    return out
