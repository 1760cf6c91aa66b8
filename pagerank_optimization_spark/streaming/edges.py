"""Structured-streaming edge ingestion from a live transcript feed.

The reference is batch-only (SURVEY.md §2.9) — this extends the engine to
continuous transcript arrival, which a production link-graph over agent
transcripts needs:

- ``stream_transcripts``      file-source stream with the fixed schema;
- ``streaming_tool_edges``    the stateless edge family (project + filter —
                              identical logic to the batch derivation);
- ``streaming_reply_edges``   the STATEFUL family: reply adjacency needs
                              the previous turn's entity per conversation,
                              carried across micro-batches with
                              ``applyInPandasWithState`` (per-conv state =
                              last seen (turn_idx, entity)); within a
                              micro-batch rows are sorted by turn_idx, rows
                              older than the saved state are late data and
                              are dropped (the batch window-lag semantics,
                              made incremental);
- ``tool_usage_rates``        watermarked sliding-window tool-invocation
                              counts (late data bounded by the watermark).

Batch⇄stream equivalence is the test contract: feeding the same
transcripts in chunks (splitting conversations across micro-batches) must
yield exactly the batch ``build_edges`` reply/tool edge multiset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pagerank_optimization_spark.functions.entities import agent_key_expr, turn_entity_expr
from pagerank_optimization_spark.sources.transcripts import TRANSCRIPT_SCHEMA

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType(), True),
        T.StructField("last_entity", T.StringType(), True),
    ]
)


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch: state crosses batches
        .parquet(path)
    )


def _with_entity(transcripts: DataFrame) -> DataFrame:
    return transcripts.withColumn(
        "entity", turn_entity_expr(F.col("role"), F.col("conv_id"), F.col("tool"))
    ).filter(F.col("entity").isNotNull())


def streaming_tool_edges(transcripts: DataFrame) -> DataFrame:
    """Stateless: assistant turn with a tool → agent→tool edge (same
    expression as the batch path — stream/batch unification is free for
    projections/filters)."""
    return (
        transcripts.filter((F.col("role") == "assistant") & F.col("tool").isNotNull())
        .select(
            F.concat(F.lit("agent:"), agent_key_expr(F.col("conv_id"))).alias("src"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("dst"),
        )
    )


def streaming_reply_edges(transcripts: DataFrame) -> DataFrame:
    """Stateful reply adjacency: per conv_id, edge entity(turn t) →
    entity(previous seen turn), with the previous turn carried across
    micro-batches in group state."""

    def emit(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last_turn, last_entity = state.get if state.exists else (None, None)
        srcs, dsts = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx")
            for turn_idx, entity in zip(pdf["turn_idx"], pdf["entity"]):
                if last_turn is not None and turn_idx <= last_turn:
                    continue  # late/duplicate turn — batch semantics saw it already
                if last_entity is not None:
                    srcs.append(entity)
                    dsts.append(last_entity)
                last_turn, last_entity = int(turn_idx), entity
        state.update((last_turn, last_entity))
        if srcs:
            yield pd.DataFrame({"src": srcs, "dst": dsts})

    return (
        _with_entity(transcripts)
        .select("conv_id", "turn_idx", "entity")
        .groupBy("conv_id")
        .applyInPandasWithState(
            emit,
            outputStructType=EDGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tool_usage_rates(transcripts: DataFrame, *, window: str = "1 hour", slide: str | None = None) -> DataFrame:
    """Watermarked windowed tool-invocation counts — the standard
    late-data-bounded streaming aggregation over the feed."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .withWatermark("ts", "2 hours")
        .groupBy(w.alias("win"), "tool")
        .agg(F.count("*").alias("n_invocations"))
        .select(F.col("win.start").alias("window_start"), "tool", "n_invocations")
    )
