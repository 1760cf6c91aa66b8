"""Stream⇄batch equivalence for the count-min sketch: after any
micro-batch chunking of a corpus, the complete-mode running sketch must
equal the batch token_countmin cell-for-cell (linearity = incremental
aggregation), with state capped at depth·width cells."""

import glob
import os
import shutil
import tempfile

import pytest

from pagerank_optimization_spark.operators.vocab import token_countmin
from pagerank_optimization_spark.sources.documents import synthesize_documents
from pagerank_optimization_spark.streaming.sketch import streaming_token_countmin

DEPTH, WIDTH = 4, 256


def _write_chunks(spark, rows, d, n_chunks):
    per = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        tmp = f"{d}/c{i}"
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        os.rename(part, f"{d}/chunk{i}.parquet")
        shutil.rmtree(tmp)


@pytest.fixture()
def corpus(spark):
    docs = synthesize_documents(spark, 200, seed=11).select("doc_id", "text")
    rows = docs.orderBy("doc_id").collect()
    d = tempfile.mkdtemp(prefix="cmfeed_")
    yield d, rows, docs
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_countmin_matches_batch(spark, corpus):
    d, rows, docs = corpus
    _write_chunks(spark, rows, d, n_chunks=4)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_token_countmin(stream, depth=DEPTH, width=WIDTH)
        .writeStream.format("memory")
        .queryName("scm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["d"], r["col"]): r["cnt"]
        for r in spark.sql("SELECT * FROM scm").collect()
    }
    want = {
        (r["d"], r["col"]): r["cnt"]
        for r in token_countmin(docs, depth=DEPTH, width=WIDTH).collect()
    }
    assert got == want
    assert len(got) <= DEPTH * WIDTH  # state cap holds by construction
    assert sum(v for (dd, _), v in got.items() if dd == 0) > 0
