"""PMI co-occurrence tests: python-recompute oracle on a hand corpus +
convention checks (directed counts, diagonal double-count, min_count)."""

import math
from collections import Counter

import pytest

from pagerank_optimization_spark.operators.cooccur import pmi_pairs


def _py_pmi(texts, window, min_count):
    nd = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for j in range(1, window + 1):
            for i in range(len(toks) - j):
                x, y = toks[i], toks[i + j]
                nd[(x, y)] += 1
                nd[(y, x)] += 1
    m = Counter()
    for (a, _b), c in nd.items():
        m[a] += c
    n_tot = sum(nd.values())
    out = {}
    for (a, b), c in nd.items():
        if a <= b and c >= min_count:
            out[(a, b)] = (c, round(math.log(c * n_tot / (m[a] * m[b])), 6))
    return out


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat and dog and cat",
    "deep learning of deep nets",
    "the the the",  # diagonal pairs (the, the)
    "",
]


@pytest.mark.parametrize("window,min_count", [(1, 1), (2, 2), (3, 1)])
def test_pmi_matches_python_oracle(spark, window, min_count):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = {
        (r.a, r.b): (r.pair_count, r.pmi)
        for r in pmi_pairs(docs, window=window, min_count=min_count).collect()
    }
    want = _py_pmi(CORPUS, window, min_count)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


def test_pmi_diagonal_counts_twice(spark):
    # "x x x": window-1 events (x,x) twice -> directed diagonal count 4
    docs = spark.createDataFrame([(0, "x x x")], "doc_id long, text string")
    rows = pmi_pairs(docs, window=1, min_count=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b, r.pair_count) == ("x", "x", 4)
    # the whole collection is this one cell: pmi = ln(4*4/(4*4)) = 0
    assert r.pmi == 0.0


def test_pmi_collocation_beats_independence(spark):
    # "san francisco" always adjacent; "san" and "the" never adjacent
    texts = ["san francisco is the city by the bay"] * 5 + [
        "the bay area includes san francisco and oakland"
    ] * 5
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r.a, r.b): r.pmi for r in pmi_pairs(docs, window=2, min_count=1).collect()}
    assert got[("francisco", "san")] > 0.5
    assert ("san", "the") not in got  # never within the window


def test_pmi_rejects_bad_params(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pmi_pairs(docs, window=0)
    with pytest.raises(ValueError):
        pmi_pairs(docs, min_count=0)
