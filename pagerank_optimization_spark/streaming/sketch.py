"""Streaming count-min sketch: live token-frequency monitoring over a
continuous document feed.

The batch sketch (operators.vocab.token_countmin) is a plain groupBy
aggregation over a FIXED depth×width cell domain — and that is exactly
the property that makes it a legal UNBOUNDED streaming aggregation:
Structured Streaming keeps one state row per distinct group key, so an
exact vocabulary histogram over a stream would grow state without
bound (billions of distinct tokens, no watermark can expire them
without changing the answer), while the sketch's state is capped at
depth·width cells forever. Count-min linearity (cells merge by ADD) is
precisely incremental-aggregation compatibility: each micro-batch's
partial counts fold into the running cells, no retraction, no
watermark needed.

Equivalence contract (tested): after consuming a corpus across any
micro-batch chunking, the complete-mode result table equals the batch
``token_countmin`` of the same corpus cell-for-cell.

Scale notes: state is ≤ depth·width longs per query (a few KB),
hash-partitioned by cell; hot tokens pre-aggregate inside each
micro-batch exactly as the batch plan does map-side. Use output mode
"complete" (tiny table) or "update" (changed cells only) downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_token_countmin(
    documents: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
    salt: str = "cm",
) -> DataFrame:
    """→ streaming (d, col, cnt): the running count-min sketch of every
    token occurrence seen so far. Delegates to the batch operator — the
    plan is the same fixed-grid aggregation; only the sink's output
    mode differs (complete/update)."""
    from ..operators.vocab import token_countmin

    return token_countmin(
        documents, depth=depth, width=width, text_col=text_col, salt=salt
    )
