"""Differential + property tests for the vocabulary-stats, PII-redaction,
and weighted-sampling operators.

vocab_topk is checked against a pure-python recount (collections.Counter
over the same tokenization); redact_pii against hand-crafted strings with
known match sets plus an idempotency property (a redacted corpus passes a
second redaction unchanged); weighted_hash_sample against the membership
laws that make it a sampling primitive (weight-1 keeps all, weight-0
none, monotone nesting in the weight under a fixed salt).
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.pii import PII_RULES, redact_pii
from pagerank_optimization_spark.operators.sampling import weighted_hash_sample
from pagerank_optimization_spark.operators.vocab import vocab_topk

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


# --- vocab_topk ---------------------------------------------------------


def test_vocab_topk_matches_python_recount(docs):
    rows = docs.select("doc_id", "text").collect()
    cf, df_ = Counter(), Counter()
    for r in rows:
        toks = [t for t in re.split(r"\s+", r.text.lower()) if t]
        cf.update(toks)
        df_.update(set(toks))
    want = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = vocab_topk(docs, 20).orderBy("rank").collect()
    assert [(g.token, g.cf) for g in got] == want
    for i, g in enumerate(got):
        assert g.rank == i + 1
        assert g.df == df_[g.token]


def test_vocab_topk_tiebreak_is_token_asc(spark):
    d = spark.createDataFrame(
        [(0, "b a"), (1, "a b"), (2, "c")], "doc_id long, text string"
    )
    got = vocab_topk(d, 3).orderBy("rank").collect()
    # a and b tie at cf=2 → token ASC breaks it; c (cf=1) last
    assert [(g.token, g.cf, g.df, g.rank) for g in got] == [
        ("a", 2, 2, 1),
        ("b", 2, 2, 2),
        ("c", 1, 1, 3),
    ]


# --- redact_pii ---------------------------------------------------------


def test_redact_pii_known_matches(spark):
    d = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org or at root@h.io today"),
            (1, "server 192.168.0.1 and 10.0.0.255 up"),
            (2, "ssn 123-45-6789 phone 555-123-4567 alt 555-1234-0000"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(d).collect()}
    assert (got[0].n_email, got[0].n_ipv4, got[0].n_ssn, got[0].n_phone) == (2, 0, 0, 0)
    assert got[0].text_redacted == "mail me at <EMAIL> or at <EMAIL> today"
    assert (got[1].n_email, got[1].n_ipv4) == (0, 2)
    assert got[1].text_redacted == "server <IP> and <IP> up"
    assert (got[2].n_ssn, got[2].n_phone) == (1, 2)
    assert got[2].text_redacted == "ssn <SSN> phone <PHONE> alt <PHONE>"
    assert got[3].text_redacted == got[3].text_redacted == d.collect()[3].text
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_ssn, got[3].n_phone) == (
        0,
        0,
        0,
        0,
    )


def test_redact_pii_idempotent(spark):
    d = spark.createDataFrame(
        [(0, "a@b.co 1.2.3.4 123-45-6789 555-123-4567")],
        "doc_id long, text string",
    )
    once = redact_pii(d).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    twice = redact_pii(once).collect()[0]
    assert twice.text_redacted == "<EMAIL> <IP> <SSN> <PHONE>"
    assert (twice.n_email, twice.n_ipv4, twice.n_ssn, twice.n_phone) == (0, 0, 0, 0)


def test_pii_rules_ssn_phone_disjoint():
    ssn_pat = dict((n, p) for n, p, _ in PII_RULES)["ssn"]
    phone_pat = dict((n, p) for n, p, _ in PII_RULES)["phone"]
    assert re.search(ssn_pat, "123-45-6789")
    assert not re.search(phone_pat, "123-45-6789")
    assert re.search(phone_pat, "555-123-4567")
    assert not re.search(ssn_pat, "555-123-4567")


# --- weighted_hash_sample -----------------------------------------------


def test_weighted_sample_membership_laws(docs):
    n = docs.count()
    assert weighted_hash_sample(docs, F.lit(1.0), "doc_id").count() == n
    assert weighted_hash_sample(docs, F.lit(0.0), "doc_id").count() == 0
    lo = set(
        r.doc_id
        for r in weighted_hash_sample(docs, F.lit(0.2), "doc_id").collect()
    )
    hi = set(
        r.doc_id
        for r in weighted_hash_sample(docs, F.lit(0.6), "doc_id").collect()
    )
    assert lo < hi  # nesting: same salt, higher weight ⊇ lower weight
    # out-of-range weights clamp instead of misbehaving
    assert weighted_hash_sample(docs, F.lit(7.0), "doc_id").count() == n
    assert weighted_hash_sample(docs, F.lit(-3.0), "doc_id").count() == 0


def test_weighted_sample_rate_tracks_weight(docs):
    n = docs.count()
    kept = weighted_hash_sample(docs, F.lit(0.5), "doc_id").count()
    assert abs(kept / n - 0.5) < 0.1


# --- bpe_pair_counts ------------------------------------------------------


def test_bpe_pairs_match_python_recount(docs):
    from pagerank_optimization_spark.operators.vocab import bpe_pair_counts

    rows = docs.select("text").collect()
    words = Counter()
    for r in rows:
        words.update(t for t in re.split(r"\s+", r.text.lower()) if t)
    pairs = Counter()
    for w, f in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = bpe_pair_counts(docs, 15).orderBy("rank").collect()
    assert [((g.left, g.right), g.pair_count) for g in got] == want


def test_bpe_pairs_single_char_words_contribute_nothing(spark):
    from pagerank_optimization_spark.operators.vocab import bpe_pair_counts

    d = spark.createDataFrame(
        [(0, "a b c ab")], "doc_id long, text string"
    )
    got = bpe_pair_counts(d, 10).collect()
    assert [(g.left, g.right, g.pair_count) for g in got] == [("a", "b", 1)]


def _py_bpe_merges(word_freqs, n):
    """Reference BPE trainer (Sennrich et al., greedy-leftmost merge)."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n):
        pairs = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, cnt))
        new = {}
        for syms, f in words.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def test_bpe_train_merges_sennrich_example(spark):
    from pagerank_optimization_spark.operators.vocab import bpe_train_merges

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = sorted(
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, 5).collect()
    )
    # canonical sequence under (count DESC, left, right) tie-break
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
    ]


def test_bpe_train_merges_matches_reference_impl(spark):
    from collections import Counter

    from pagerank_optimization_spark.operators.vocab import bpe_train_merges

    texts = ["the cat catches catnip", "banana bandana", "aaa abab the the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = Counter(w for t in texts for w in t.split())
    want = [
        (i + 1, l, r, c)
        for i, (l, r, c) in enumerate(_py_bpe_merges(dict(wf), 6))
    ]
    got = sorted(
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, 6).collect()
    )
    assert got == want


def test_bpe_train_merges_greedy_leftmost_and_exhaustion(spark):
    from pagerank_optimization_spark.operators.vocab import bpe_train_merges

    # 'aaaa' exhausts: (a,a)x3 -> 'aa aa' -> (aa,aa) -> 'aaaa' -> no pairs
    docs = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    got = sorted(
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, 4).collect()
    )
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]  # rounds 3-4 emit nothing
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train_merges(docs, 0)


# --- bpe_encode -----------------------------------------------------------


def _py_bpe_encode(word, merges):
    """Reference greedy-leftmost application of an ordered merge list."""
    syms = list(word)
    for l, r in merges:
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    from pagerank_optimization_spark.operators.vocab import (
        bpe_encode,
        bpe_train_merges,
    )

    texts = ["low lower newest widest", "newest low low estates", "the west is widest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, 5)
    mrows = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.subword_text)
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split()
        encs = [_py_bpe_encode(w, mrows) for w in toks]
        want = (
            len(toks),
            sum(len(e) for e in encs),
            " ".join(" ".join(e) for e in encs),
        )
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_bpe_encode_empty_merges_is_char_split(spark):
    from pagerank_optimization_spark.operators.vocab import bpe_encode

    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    merges = spark.createDataFrame([], "rank int, left string, right string")
    row = bpe_encode(docs, merges).collect()[0]
    assert (row.n_tokens, row.n_subwords, row.subword_text) == (2, 4, "a b c d")


def test_bpe_encode_tokenless_doc_survives(spark):
    from pagerank_optimization_spark.operators.vocab import (
        bpe_encode,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aa aa ab"), (1, "   ")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.subword_text)
        for r in bpe_encode(docs, bpe_train_merges(docs, 2)).collect()
    }
    assert got[1] == (0, 0, "")
    assert got[0][0] == 3


def test_bpe_encode_rejects_bad_merge_schema(spark):
    from pagerank_optimization_spark.operators.vocab import bpe_encode

    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    bad = spark.createDataFrame([(1,)], "rank int")
    with pytest.raises(ValueError):
        bpe_encode(docs, bad)


# --- zipf_fit -----------------------------------------------------------


def test_zipf_fit_matches_numpy_polyfit(docs):
    """Slope/intercept must equal numpy.polyfit on the same (ln rank,
    ln cf) points from the same deterministic top-N cut (1e-6 bar — the
    operator rounds to 6dp)."""
    import numpy as np

    from pagerank_optimization_spark.operators.vocab import zipf_fit

    rows = docs.select("doc_id", "text").collect()
    cf = Counter()
    for r in rows:
        cf.update(t for t in re.split(r"\s+", r.text.lower()) if t)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    skip = 3
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))[skip:]
    y = np.log(np.array([c for _, c in top], dtype=np.float64))[skip:]
    slope, intercept = np.polyfit(x, y, 1)

    got = zipf_fit(docs, top_n=200, skip_ranks=skip).collect()[0]
    assert got.tokens_fit == len(top) - skip
    assert abs(got.slope - slope) < 1.0e-6
    assert abs(got.intercept - intercept) < 1.0e-6


def test_zipf_fit_is_negative_on_natural_corpus(docs):
    """Sanity: the synthesized corpus is Zipf-sampled, so the fitted
    slope must be clearly negative (else the query is vacuous)."""
    from pagerank_optimization_spark.operators.vocab import zipf_fit

    got = zipf_fit(docs, top_n=400, skip_ranks=5).collect()[0]
    assert got.slope < -0.3


# --- heaps_fit ----------------------------------------------------------


def test_heaps_fit_matches_numpy_polyfit(docs):
    """Slope/intercept must equal numpy.polyfit over the python-rebuilt
    vocabulary-growth curve (same doc_id order, same min_tokens cut)."""
    import numpy as np

    from pagerank_optimization_spark.operators.vocab import heaps_fit

    rows = sorted(docs.select("doc_id", "text").collect(), key=lambda r: r.doc_id)
    seen: set = set()
    cum_tok, xs, ys = 0, [], []
    min_tokens = 50
    for r in rows:
        toks = [t for t in re.split(r"\s+", r.text.lower()) if t]
        cum_tok += len(toks)
        seen.update(toks)
        if cum_tok >= min_tokens and seen:
            xs.append(np.log(cum_tok))
            ys.append(np.log(len(seen)))
    slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)

    got = heaps_fit(docs, min_tokens=min_tokens).collect()[0]
    assert got.docs_fit == len(xs)
    assert abs(got.slope - round(slope, 6)) < 1.0e-6
    assert abs(got.intercept - round(intercept, 6)) < 1.0e-6


def test_heaps_fit_partition_invariance(docs):
    """The two-level prefix scan must give identical results at any
    partition count (the pack_documents contract)."""
    from pagerank_optimization_spark.operators.vocab import heaps_fit

    a = heaps_fit(docs, min_tokens=50, partitions=2).collect()[0]
    b = heaps_fit(docs, min_tokens=50, partitions=16).collect()[0]
    assert a == b


def test_heaps_fit_exponent_in_natural_range(docs):
    """Sanity: the synthesized Zipf-sampled corpus must fit a sublinear
    growth exponent 0 < β < 1 (else the curve or the scan is broken)."""
    from pagerank_optimization_spark.operators.vocab import heaps_fit

    got = heaps_fit(docs, min_tokens=100).collect()[0]
    assert 0.0 < got.slope < 1.0


def test_heaps_fit_rejects_bad_args(docs):
    from pagerank_optimization_spark.operators.vocab import heaps_fit

    with pytest.raises(ValueError):
        heaps_fit(docs, min_tokens=-1)
