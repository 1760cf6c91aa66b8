"""Differential tests for the unigram-LM corpus scorer
(operators.lm.unigram_lm_scores): pure-python recount of the add-k model
on the real sf0.01 corpus, plus hand cases pinning the OOV branch
(vocab_limit truncation), the train_filter mode, and empty documents.
"""

import math
import re
from collections import Counter

import pytest

from pagerank_optimization_spark.operators.lm import unigram_lm_scores

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _toks(text):
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _expected(rows, k=0.5, vocab=None, train_ids=None):
    """Python recount: {doc_id: (n_tok, avg_logp)}. ``vocab``: truncated
    token set (everything else OOV). ``train_ids``: LM trained on these
    docs only (default all)."""
    cf = Counter()
    for did, text in rows:
        if train_ids is None or did in train_ids:
            cf.update(_toks(text))
    if vocab is not None:
        cf = Counter({t: c for t, c in cf.items() if t in vocab})
    t, v = sum(cf.values()), len(cf)
    denom = t + k * (v + 1)
    out = {}
    for did, text in rows:
        toks = _toks(text)
        if not toks:
            out[did] = (0, 0.0)
            continue
        s = sum(math.log((cf.get(tok, 0) + k) / denom) for tok in toks)
        out[did] = (len(toks), s / len(toks))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


def test_lm_scores_match_python_recount(docs):
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    want = _expected(rows, k=0.5)
    got = {r.doc_id: r for r in unigram_lm_scores(docs, k=0.5).collect()}
    assert set(got) == set(want)
    for did, (n_tok, avg) in want.items():
        g = got[did]
        assert g.n_tok == n_tok
        assert g.avg_logp == pytest.approx(round(avg, 6), abs=2e-6)
        assert g.bits_per_token == pytest.approx(round(-avg / math.log(2), 6), abs=2e-6)


def test_lm_vocab_limit_scores_tail_as_oov(spark):
    rows = [(0, "a a a b b c"), (1, "c d"), (2, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # top-2 vocab by (cf desc, token asc) = {a, b}; c and d are OOV
    want = _expected(rows, k=0.5, vocab={"a", "b"})
    got = {r.doc_id: r for r in unigram_lm_scores(d, k=0.5, vocab_limit=2).collect()}
    for did, (n_tok, avg) in want.items():
        assert got[did].n_tok == n_tok
        assert got[did].avg_logp == pytest.approx(round(avg, 6), abs=2e-6)
    # empty doc present with zero score
    assert got[2].n_tok == 0 and got[2].avg_logp == 0.0 and got[2].bits_per_token == 0.0


def test_lm_train_filter_scores_held_out_docs(spark):
    rows = [(0, "x x y"), (1, "x z"), (2, "q q")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    want = _expected(rows, k=0.5, train_ids={0, 1})
    got = {
        r.doc_id: r
        for r in unigram_lm_scores(
            d, k=0.5, train_filter=lambda df: df.filter("doc_id < 2")
        ).collect()
    }
    for did, (n_tok, avg) in want.items():
        assert got[did].n_tok == n_tok
        assert got[did].avg_logp == pytest.approx(round(avg, 6), abs=2e-6)


def test_lm_duplicate_docs_score_identically(spark):
    d = spark.createDataFrame(
        [(0, "same words here"), (1, "same words here"), (2, "other text")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logp for r in unigram_lm_scores(d).collect()}
    assert got[0] == got[1]


def test_lm_rejects_bad_params(spark):
    d = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram_lm_scores(d, k=0.0)
    with pytest.raises(ValueError):
        unigram_lm_scores(d, vocab_limit=0)
