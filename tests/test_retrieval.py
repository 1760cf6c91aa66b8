"""BM25 differential tests — operators.retrieval.bm25_topk vs an
independent pure-Python BM25 (math module, no Spark/DuckDB code paths)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from pagerank_optimization_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "hash join beats sort merge join on small tables"),
    (1, "vector scan with late materialization"),
    (2, "hash hash hash collisions degrade the hash join"),
    (3, "sort merge join wins when both sides are pre sorted"),
    (4, "a short doc"),
    (5, "join join join join join"),
    (6, "the quick brown fox jumps over the lazy dog"),
    (7, "hash partitioned shuffle feeds the vector join operator"),
]


def py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = Counter()
    for tk in toks.values():
        for t in set(tk):
            if t in terms:
                df[t] += 1
    out = {}
    for i, tk in toks.items():
        tf = Counter(w for w in tk if w in terms)
        s = 0.0
        for t, f in tf.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * len(tk) / avgdl))
        if s > 0.0:
            out[i] = s
    return out


@pytest.mark.parametrize("terms", [["hash", "join"], ["vector"], ["hash", "join", "vector", "dog"]])
def test_bm25_matches_python_oracle(spark, terms):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_topk(docs, terms, top_n=100).collect()}
    want = {i: round(s, 6) for i, s in py_bm25(DOCS, set(terms)).items()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=2e-6), (i, got[i], want[i])


def test_bm25_topn_order_and_cut(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, ["hash", "join"], top_n=3).collect()
    assert len(rows) == 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 2 (tf-heavy 'hash') and doc 5 (tf-heavy 'join') must beat doc 6 (no hits)
    assert 6 not in {r.doc_id for r in rows}


def test_bm25_empty_terms_raises(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
