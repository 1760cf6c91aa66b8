"""Streaming exact deduplication: dedup-on-arrival for a continuous
document feed.

The batch pipeline dedups a finished corpus (operators.dedup); a live
ingestion pipeline needs the incremental form — each arriving document
is kept iff its normalized-content fingerprint has never been seen in
the stream's lifetime. That is a classic keyed-state streaming operator:

- group the stream by the portable content fingerprint
  (functions.text.portable_fingerprint_expr — the same key the batch
  ``exact_dedup`` canonicalizes on),
- per fingerprint, ``applyInPandasWithState`` keeps one tiny state cell
  (the winning doc_id); the first arrival is emitted, every later copy
  is swallowed.

Equivalence contract (tested): feeding a corpus in doc_id order — any
micro-batch chunking — emits exactly the batch ``exact_dedup``
canonical set (min doc_id per fingerprint). Out-of-order feeds keep
first-ARRIVAL semantics instead, the only causal choice for a live
stream (a dedup service cannot un-emit a document because a
smaller-id copy arrived later).

Scale notes: state is one (long, long) cell per DISTINCT fingerprint,
hash-partitioned across executors by the group key — the natural shard
of a 100 TB dedup index. A hot fingerprint (the same press release
syndicated a billion times) is ONE group and its copies collapse to a
drop inside that group's iterator; no row amplification anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pagerank_optimization_spark.functions.text import portable_fingerprint_expr

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
    ]
)

_SEEN_SCHEMA = T.StructType([T.StructField("winner_id", T.LongType(), True)])


def streaming_exact_dedup(
    documents: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ streaming (doc_id, fingerprint): first-arrival survivors of the
    document feed, keyed by normalized-content fingerprint. Within one
    micro-batch the smallest doc_id among a fingerprint's arrivals wins
    (deterministic regardless of partition arrival order); across
    micro-batches the earlier batch wins (causal first-arrival)."""

    def emit(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain: every row is a later copy
                pass
            return
        winner = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                winner = m if winner is None else min(winner, m)
        if winner is not None:
            state.update((winner,))
            yield pd.DataFrame({"doc_id": [winner], "fingerprint": [key[0]]})

    return (
        documents.select(
            F.col(id_col).cast("long").alias("doc_id"),
            portable_fingerprint_expr(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .applyInPandasWithState(
            emit,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_SEEN_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
