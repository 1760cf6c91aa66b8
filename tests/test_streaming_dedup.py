"""Stream⇄batch equivalence for dedup-on-arrival: a corpus fed in doc_id
order across micro-batches must emit exactly the batch exact_dedup
canonical set; out-of-order feeds keep first-arrival (causal) semantics."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.dedup import exact_dedup
from pagerank_optimization_spark.sources.documents import synthesize_documents
from pagerank_optimization_spark.streaming.dedup import streaming_exact_dedup


def _write_chunks(spark, rows, d, n_chunks):
    """rows (already ordered) → n_chunks parquet files chunk0..chunkN (the
    file source triggers one micro-batch per file)."""
    per = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        tmp = f"{d}/c{i}"
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        os.rename(part, f"{d}/chunk{i}.parquet")
        shutil.rmtree(tmp)


def _run(spark, d, name):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {r.doc_id for r in spark.sql(f"SELECT doc_id FROM {name}").collect()}


@pytest.fixture()
def corpus(spark):
    # 300 docs with planted exact-dup groups of 5 (sources.documents band 2)
    docs = synthesize_documents(spark, 300, seed=7).select("doc_id", "text")
    rows = docs.orderBy("doc_id").collect()
    d = tempfile.mkdtemp(prefix="docfeed_")
    yield d, rows, docs
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_matches_batch_in_order(spark, corpus):
    d, rows, docs = corpus
    _write_chunks(spark, rows, d, n_chunks=3)
    got = _run(spark, d, "sdedup_ordered")
    want = {
        r.doc_id
        for r in exact_dedup(docs).filter(F.col("doc_id") == F.col("canonical_id")).collect()
    }
    assert got == want
    assert len(got) < len(rows)  # the planted dup groups actually collapsed


def test_streaming_dedup_first_arrival_out_of_order(spark, corpus):
    """Feed doc_ids in REVERSE order: the stream keeps the first-ARRIVAL
    batch of each fingerprint (min doc_id within that batch) — causal
    semantics, deliberately different from the batch canonical min."""
    d, rows, docs = corpus
    feed = list(reversed(rows))
    _write_chunks(spark, feed, d, n_chunks=3)
    got = _run(spark, d, "sdedup_reversed")
    # simulate the contract in python: earliest batch owning the key wins,
    # min doc_id inside that batch breaks within-batch arrival ties
    norm = {
        r.doc_id: r.k
        for r in docs.select(
            "doc_id",
            F.trim(
                F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
            ).alias("k"),
        ).collect()
    }
    per = (len(feed) + 2) // 3
    want_map = {}  # key -> (batch_idx, winner_id)
    for pos, row in enumerate(feed):
        b, k = pos // per, norm[row.doc_id]
        if k not in want_map or b < want_map[k][0]:
            want_map[k] = (b, row.doc_id)
        elif b == want_map[k][0]:
            want_map[k] = (b, min(want_map[k][1], row.doc_id))
    want = {w for _, w in want_map.values()}
    assert got == want


def test_streaming_dedup_cross_batch_first_arrival_beats_min_id(spark):
    """A smaller doc_id arriving in a LATER micro-batch loses to the
    earlier arrival — the causal divergence from the batch canonical."""
    import pandas as pd  # noqa: F401

    d = tempfile.mkdtemp(prefix="docfeed_")
    try:
        dup = "identical duplicate body"
        _write_chunks(
            spark,
            [(7, dup), (8, "unique one")],  # batch 0: id 7 owns the key
            d,
            n_chunks=1,
        )
        spark.createDataFrame(
            [(1, dup)], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/late")
        (part,) = glob.glob(f"{d}/late/part-*.parquet")
        os.rename(part, f"{d}/chunk9.parquet")  # sorts after chunk0 → later batch
        shutil.rmtree(f"{d}/late")
        got = _run(spark, d, "sdedup_causal")
        assert got == {7, 8}  # id 1 arrived later and was swallowed
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_exactly_one_survivor_per_class(spark, corpus):
    d, rows, docs = corpus
    _write_chunks(spark, rows, d, n_chunks=2)
    got = _run(spark, d, "sdedup_classes")
    classes = exact_dedup(docs).select("doc_id", "canonical_id").collect()
    by_class = {}
    for r in classes:
        by_class.setdefault(r.canonical_id, set()).add(r.doc_id)
    for members in by_class.values():
        assert len(got & members) == 1
