"""Temporal PageRank delta — authority drift over the corpus time range
(engine-brief addition: the transcripts are timestamped, so "who matters
LATELY" has three answers in this engine — activity trend
(sessions.entity_trend), recency-decayed rank (graph_build
edge_weights="decay"), and THIS: the same PageRank kernel
(tuned_variant_baseline.c:107-148 semantics via operators.pagerank) run
on the early-half and late-half interaction graphs independently, so
rank mass movements are attributable to structural change, not decay
weighting).

Split rule: midpoint of [min ts, max ts] over all transcript rows, tie →
early (strict >) — byte-identical to sessions.entity_trend so the two
screens are joinable. Each half's graph is derived INDEPENDENTLY from
the filtered turn set (reply adjacency bridges only within a half), then
k0 fixed supersteps per half, full outer join on entity with missing
ranks coalesced to 0 (an entity absent from a half has no stationary
mass there — 0 is the join convention, documented in the twin too).

Scale shape: the span is a broadcast one-row aggregate (zero collects);
each half is one build_graph + one PageRank run — 2·k0 frontier shuffles
total, the same cost envelope as running the flagship query twice; the
final full outer join is |V|-sized on the already-shuffled entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_build import build_graph
from .pagerank import pagerank
from .sessions import _epoch_s


def pagerank_delta(
    transcripts: DataFrame,
    *,
    k0: int = 5,
    partitions: int | None = None,
    round_to: int = 8,
) -> DataFrame:
    """→ (entity, pr_early, pr_late, delta): damped PageRank (k0 fixed
    supersteps, engine defaults) over the early-half vs late-half
    transcript graphs; delta = pr_late − pr_early. Raises (from the
    graph build) if a half is empty — a corpus whose timestamps are all
    identical has no late half to rank."""
    if k0 < 1:
        raise ValueError(f"pagerank_delta: k0 must be ≥ 1, got {k0}")
    cols = transcripts.columns
    e = _epoch_s(F.col("ts"))
    span = transcripts.agg(
        F.min(e).alias("_lo"), F.max(e).alias("_hi")
    )
    spanned = transcripts.crossJoin(F.broadcast(span))
    early = spanned.filter(e * 2 <= F.col("_lo") + F.col("_hi")).select(cols)
    late = spanned.filter(e * 2 > F.col("_lo") + F.col("_hi")).select(cols)

    ranks = []
    for half in (early, late):
        v, ed = build_graph(half)
        ranks.append(pagerank(v, ed, fixed_iters=k0, partitions=partitions).ranks)
    a = ranks[0].select("entity", F.col("pr").alias("_pa"))
    b = ranks[1].select("entity", F.col("pr").alias("_pb"))
    pa = F.coalesce(F.col("_pa"), F.lit(0.0))
    pb = F.coalesce(F.col("_pb"), F.lit(0.0))
    return a.join(b, "entity", "full_outer").select(
        "entity",
        F.round(pa, round_to).alias("pr_early"),
        F.round(pb, round_to).alias("pr_late"),
        F.round(pb - pa, round_to).alias("delta"),
    )
