"""TextRank keyword scoring vs a pure-python twin: the token graph is
rebuilt in python (same tokenizer, same symmetric window events, same
min_count cut) and fed to the numpy PageRank oracle — so the test checks
BOTH the graph construction and that the ranks are exactly the engine's
PageRank over it (1e-9 on 8-dp-rounded scores)."""

import re
from collections import Counter

import pytest

from pagerank_optimization_spark.operators.textrank import textrank_keywords
from pagerank_optimization_spark.sources.documents import synthesize_documents
from tests import oracle


def _python_token_graph(texts, window, min_count):
    counts = Counter()
    for t in texts:
        toks = [x for x in re.split(r"\s+", t.lower()) if x]
        for j in range(1, window + 1):
            for i in range(len(toks) - j):
                counts[(toks[i], toks[i + j])] += 1
                counts[(toks[i + j], toks[i])] += 1
    edges = {
        (a, b) for (a, b), c in counts.items() if a != b and c >= min_count
    }
    vertices = sorted({v for e in edges for v in e})
    return vertices, edges


@pytest.fixture(scope="module")
def docs(spark):
    return synthesize_documents(spark, 300, seed=11).cache()


@pytest.mark.parametrize("window,min_count", [(1, 2), (2, 3)])
def test_textrank_matches_python_pagerank(spark, docs, window, min_count):
    texts = [r.text for r in docs.select("text").collect()]
    o_vertices, o_edges = _python_token_graph(texts, window, min_count)
    assert o_edges, "test corpus produced no kept pairs — vacuous"
    want = oracle.pagerank_dense(o_vertices, o_edges, fixed_iters=10)
    got = {
        r.token: r.pr
        for r in textrank_keywords(
            docs, window=window, min_count=min_count, k0=10
        ).collect()
    }
    assert got.keys() == want.keys()
    for tok, pr in want.items():
        assert abs(got[tok] - round(pr, 8)) < 1.0e-9, tok


def test_textrank_mass_is_one(spark, docs):
    from pyspark.sql import functions as F

    total = (
        textrank_keywords(docs, window=2, min_count=3, k0=5)
        .agg(F.sum("pr"))
        .collect()[0][0]
    )
    assert abs(total - 1.0) < 1.0e-6


def test_textrank_empty_graph_raises(spark, docs):
    with pytest.raises(ValueError, match="min_count"):
        textrank_keywords(docs, min_count=10**9)


def test_textrank_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError):
        textrank_keywords(docs, window=0)
    with pytest.raises(ValueError):
        textrank_keywords(docs, min_count=0)
