"""source_divergence (per-source JSD vs the corpus mix) vs a pure-python
twin — the python side recomputes the FULL textbook JSD over the union
support (explicitly enumerating the source's absent tokens), so the test
proves the operator's closed-form absent-mass folding is exactly the
textbook statistic, not just self-consistent."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.quality import source_divergence

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _python_jsd(rows):
    """Textbook JSD per source over the union support. rows: (source, text)."""
    per_source: dict[str, Counter] = {}
    corpus = Counter()
    for src, text in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        per_source.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    ctot = sum(corpus.values())
    out = {}
    for src, cnts in per_source.items():
        stot = sum(cnts.values())
        jsd = 0.0
        for tok, tcnt in corpus.items():  # union support = corpus vocab
            p = cnts.get(tok, 0) / stot
            q = tcnt / ctot
            m = 0.5 * (p + q)
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        out[src] = (stot, jsd)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


def test_source_divergence_matches_python(docs):
    rows = [(r.source, r.text) for r in docs.select("source", "text").collect()]
    want = _python_jsd(rows)
    got = {r.source: (r.n_tokens, r.jsd) for r in source_divergence(docs).collect()}
    assert got.keys() == want.keys()
    for src, (n_tok, jsd) in want.items():
        assert got[src][0] == n_tok, src
        # the operator rounds to 8dp — compare at that grain
        assert abs(got[src][1] - round(jsd, 8)) < 1.0e-9, src


def test_source_divergence_bounds(docs):
    for r in source_divergence(docs).collect():
        assert 0.0 <= r.jsd <= math.log(2.0) + 1.0e-12, r.source


def test_single_source_is_zero(spark):
    """One source ⇒ P = Q ⇒ JSD exactly 0 (present terms vanish, Σq = 1)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "s0"), (2, "beta gamma delta", "s0")],
        "doc_id long, text string, source string",
    )
    rows = source_divergence(docs).collect()
    assert len(rows) == 1
    assert abs(rows[0].jsd) < 1.0e-12


def test_disjoint_sources_separate(spark):
    """Two equal-mass sources with disjoint vocabularies: JSD vs the
    corpus mix must match the python twin exactly and sit far from 0 —
    the outlier screen separates (the corpus Q still shares the source's
    own tokens at half mass, so the value is below ln 2 but large)."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd", "s0"), (2, "xx yy zz ww", "s1")],
        "doc_id long, text string, source string",
    )
    rows = [(r.source, r.text) for r in docs.collect()]
    want = _python_jsd(rows)
    got = {r.source: r.jsd for r in source_divergence(docs).collect()}
    for src in want:
        assert abs(got[src] - round(want[src][1], 8)) < 1.0e-9, src
        assert got[src] > 0.2
