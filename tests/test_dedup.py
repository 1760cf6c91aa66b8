"""Dedup operator tests: exact dedup + n-gram Jaccard vs a python oracle;
MinHash-LSH and SimHash property-tested (identical → found with max score,
near-dup → found, disjoint → absent)."""

import pytest

from pagerank_optimization_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the tall green tree and birds sing in the morning sun near the river"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word change
DISJOINT = (
    "quantum flux capacitors resonate with ionized plasma streams across "
    "stellar magnetospheres during solar wind acceleration events yesterday"
)

DOCS = [
    (0, BASE),
    (1, BASE),                      # exact duplicate of 0
    (2, "  The  quick brown fox jumps over the lazy dog while the cat watches from the tall green tree and birds sing in the morning sun near the river!! "),  # formatting dup of 0
    (3, NEAR),                      # near duplicate
    (4, DISJOINT),                  # unrelated
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _py_shingles(text, k=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_jaccard(a, b, k=3):
    sa, sb = _py_shingles(a, k), _py_shingles(b, k)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    out = {r.doc_id: (r.canonical_id, r.n_copies) for r in exact_dedup(docs).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[2] == (0, 3)
    assert out[3] == (3, 1) and out[4] == (4, 1)


def test_ngram_jaccard_matches_python(docs):
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    rows = dict(DOCS)
    # oracle: all pairs with jaccard >= 0.3 (doc 2 normalizes differently —
    # engine tokenizes raw text, so "!!": compute expected from raw tokens)
    expected = {}
    for a in range(5):
        for b in range(a + 1, 5):
            j = _py_jaccard(rows[a], rows[b])
            if j >= 0.3:
                expected[(a, b)] = j
    assert set(got) == set(expected)
    for pair, j in expected.items():
        assert abs(got[pair] - j) < 1e-6


@pytest.mark.parametrize("hasher", ["xxhash64", "portable"])
def test_minhash_lsh_properties(docs, hasher):
    pairs = {
        (r.a, r.b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.4, hasher=hasher).collect()
    }
    assert pairs[(0, 1)] == 1.0           # identical docs: all permutations agree
    assert (0, 3) in pairs                # near-dup found
    assert pairs[(0, 3)] > 0.5
    assert not any(4 in p for p in pairs)  # disjoint doc never paired


def test_minhash_deterministic(docs):
    a = sorted(minhash_lsh_pairs(docs, threshold=0.4).collect())
    b = sorted(minhash_lsh_pairs(docs, threshold=0.4).collect())
    assert a == b


@pytest.mark.parametrize("hasher,bits", [("xxhash64", 64), ("portable", 48)])
def test_simhash_properties(docs, hasher, bits):
    pairs = {
        (r.a, r.b): r.hamming
        for r in simhash_pairs(docs, max_hamming=8, bits=bits, hasher=hasher).collect()
    }
    assert pairs[(0, 1)] == 0             # identical text → identical simhash
    assert (0, 3) in pairs and pairs[(0, 3)] <= 8
    assert not any(4 in p for p in pairs)


def test_dedup_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = exact_dedup(docs).collect()
    assert len(out) == docs.count()
    assert all(r.canonical_id <= r.doc_id for r in out)


def test_dedup_cascade_planted_families(spark):
    """End-to-end cascade: one planted duplicate family per tier must
    collapse at exactly that tier (exact copies at exact; near-identical
    texts at minhash-LSH; identical embeddings with unrelated texts at
    semantic), unrelated docs must survive, and stats must attribute each
    removal to the right stage."""
    from pagerank_optimization_spark.operators.dedup import dedup_cascade

    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "softly on ancient rooftops and distant bells ring through the "
            "quiet evening air of the old town square near the harbor")
    m_base = ("seven sailors mended their torn canvas sails beneath a pale "
              "winter sun while gulls wheeled overhead crying out across the "
              "gray water and nets dried slowly along the wooden pier")
    m_near = m_base.replace("pier", "dock")  # one token off: high jaccard
    docs = spark.createDataFrame(
        [
            (1, base), (2, base), (3, base),           # exact family {1,2,3}
            (10, m_base), (11, m_near),                # minhash family {10,11}
            (20, "completely different subject matter about astronomy"),
            (21, "unrelated legal contract boilerplate text entirely"),   # semantic family {20,21}
            (30, "a lone survivor document with unique content"),
            (31, "another standalone page that resembles nothing else"),
        ],
        "doc_id long, text string",
    )
    import numpy as np

    rng = np.random.default_rng(3)
    v_sem = [float(x) for x in rng.normal(size=16)]
    emb = spark.createDataFrame(
        [
            (20, v_sem), (21, list(v_sem)),            # identical → cosine 1.0
            (30, [float(x) for x in rng.normal(size=16)]),
            (31, [float(x) for x in rng.normal(size=16)]),
        ],
        "vec_id long, embedding array<double>",
    )

    survivors, stats = dedup_cascade(docs, embeddings=emb)
    ids = sorted(r.doc_id for r in survivors.select("doc_id").collect())
    assert ids == [1, 10, 20, 30, 31]

    by_stage = {s["stage"]: s for s in stats}
    assert by_stage["exact"]["removed"] == 2         # 2,3
    assert by_stage["minhash_lsh"]["removed"] == 1   # 11
    assert by_stage["semantic"]["removed"] == 1      # 21
    assert by_stage["semantic"]["survivors"] == 5


def test_collapse_families_string_ids(spark):
    """Family collapse must work in the id's own domain: string ids used to
    be silently dropped by a string→long cast (losers nulled out → nothing
    removed). A chain family a~b, b~c over string ids must collapse to its
    lexicographic-min member."""
    from pagerank_optimization_spark.operators.dedup import _collapse_pair_families

    survivors = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",), ("doc-lonely",)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c")], "a string, b string"
    )
    out = sorted(r.doc_id for r in _collapse_pair_families(survivors, pairs, "doc_id").collect())
    assert out == ["doc-a", "doc-lonely"]


def test_collapse_families_negative_ids(spark):
    """Numeric-min representative must hold over the ENTIRE long range:
    plain lpad keying sorted '-' below '0', so a negative-id family used to
    pick the wrong (non-min) representative — e.g. {-5, -3, 2} collapsed to
    -3 because '-3…' < '-5…' lexicographically (r4 ADVICE). The offset
    encoding (x + 2⁶³ as decimal) makes lexicographic min ≡ numeric min."""
    from pagerank_optimization_spark.operators.dedup import _collapse_pair_families

    survivors = spark.createDataFrame([(-5,), (-3,), (2,), (7,)], "doc_id long")
    pairs = spark.createDataFrame([(-5, -3), (-3, 2)], "a long, b long")
    out = sorted(r.doc_id for r in _collapse_pair_families(survivors, pairs, "doc_id").collect())
    assert out == [-5, 7]


def test_cascade_semantic_exact_matches_lsh_recallable(spark):
    """semantic_exact=True (the oracle-twin form) must remove at least the
    families the LSH-bucketed default finds, and on tight families (cosine
    = 1.0) both must agree exactly."""
    from pagerank_optimization_spark.operators.dedup import dedup_cascade

    import numpy as np

    rng = np.random.default_rng(11)
    texts = [(i, f"unique document number {i} " + " ".join(
        f"w{int(x)}" for x in rng.integers(0, 9999, size=40))) for i in range(8)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    v = [float(x) for x in rng.normal(size=16)]
    emb_rows = [(0, v), (1, list(v)), (2, list(v))] + [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(3, 8)
    ]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")

    s_exact, st_exact = dedup_cascade(docs, embeddings=emb, semantic_exact=True)
    s_lsh, st_lsh = dedup_cascade(docs, embeddings=emb, semantic_exact=False)
    ids_exact = sorted(r.doc_id for r in s_exact.select("doc_id").collect())
    ids_lsh = sorted(r.doc_id for r in s_lsh.select("doc_id").collect())
    # identical embeddings share every LSH bucket, so both paths collapse
    # {0,1,2} → 0 and keep everything else
    assert ids_exact == ids_lsh == [0, 3, 4, 5, 6, 7]


def test_collapse_families_rejects_unsupported_id_type(spark):
    import pytest

    from pagerank_optimization_spark.operators.dedup import _collapse_pair_families

    survivors = spark.createDataFrame([(1.5,)], "doc_id double")
    pairs = spark.createDataFrame([(1.5, 2.5)], "a double, b double")
    with pytest.raises(TypeError):
        _collapse_pair_families(survivors, pairs, "doc_id")


def test_containment_catches_embedded_quote(spark):
    """A short doc quoted inside a long one: containment ≈ 1 while
    Jaccard is small — the asymmetry is the operator's whole point."""
    from pagerank_optimization_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = ("intro words here . " + short + " . many other trailing words "
            "pad pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9 pad10 pad11 pad12")
    docs = spark.createDataFrame([(1, short), (2, long)], "doc_id long, text string")
    cont = {(r.a, r.b): r.containment
            for r in ngram_containment_pairs(docs, k=3, threshold=0.5).collect()}
    assert (1, 2) in cont and cont[(1, 2)] == 1.0  # every shingle of 1 is in 2
    assert (2, 1) not in cont                       # not vice versa
    jac = ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the quote entirely


def test_containment_matches_python_recompute(spark):
    from pagerank_optimization_spark.operators.dedup import ngram_containment_pairs

    texts = {
        1: "a b c d e f",
        2: "x y a b c d q r",
        3: "a b c d e f g h",
        4: "totally different words only",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r.a, r.b): r.containment
           for r in ngram_containment_pairs(docs, k=3, threshold=0.0).collect()}

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a, ta in texts.items():
        for b, tb in texts.items():
            if a == b:
                continue
            inter = len(sh(ta) & sh(tb))
            if inter:
                want[(a, b)] = round(inter / len(sh(ta)), 8)
    assert got == want


# --- substring_dup_spans ----------------------------------------------------


def _py_spans(ta, tb, k, min_match):
    """Reference: maximal shared token runs via diagonal islands."""
    from collections import defaultdict

    def grams(toks):
        return {i + 1: " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    ga, gb = grams(ta), grams(tb)
    diag = defaultdict(list)
    for pa, g in ga.items():
        for pb, h in gb.items():
            if g == h:
                diag[pa - pb].append(pa)
    spans = []
    for d, pas in diag.items():
        pas = sorted(pas)
        start, prev, run = pas[0], pas[0], 1
        for p in pas[1:]:
            if p == prev + 1:
                run += 1
            else:
                if k + run - 1 >= min_match:
                    spans.append((start, start - d, k + run - 1))
                start, run = p, 1
            prev = p
        if k + run - 1 >= min_match:
            spans.append((start, start - d, k + run - 1))
    return sorted(spans)


def test_substring_spans_match_python_reference(spark):
    from pagerank_optimization_spark.operators.dedup import substring_dup_spans

    texts = [
        (0, "p1 p2 p3 the shared block of nine tokens exactly here q1 q2"),
        (1, "r1 the shared block of nine tokens exactly here r2 r3 r4 r5"),
        (2, "the shared block of nine tokens exactly here and p1 p2 p3 x"),
        (3, "all different material with no overlap to anything else at all"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    rows = substring_dup_spans(docs, k=3, min_match_tokens=5).collect()
    for r in rows:
        got.setdefault((r.a, r.b), []).append((r.a_start, r.b_start, r.match_tokens))
    toks = {i: t.lower().split() for i, t in texts}
    for a in range(4):
        for b in range(a + 1, 4):
            want = _py_spans(toks[a], toks[b], 3, 5)
            assert sorted(got.get((a, b), [])) == want, (a, b)


def test_substring_spans_one_maximal_run_not_fragments(spark):
    from pagerank_optimization_spark.operators.dedup import substring_dup_spans

    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, f"a0 {shared} a1"), (1, f"b0 b1 b2 {shared}")],
        "doc_id long, text string",
    )
    rows = substring_dup_spans(docs, k=4, min_match_tokens=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a_start, r.b_start, r.match_tokens) == (2, 4, 12)


def test_substring_spans_gram_cap_fires(spark):
    from pagerank_optimization_spark.operators.dedup import substring_dup_spans

    # the same 6-token boilerplate on every doc: with max_gram_freq=2 the
    # shared grams exceed the cap and no span survives
    boiler = "one two three four five six"
    docs = spark.createDataFrame(
        [(i, f"u{i} {boiler} v{i}") for i in range(5)], "doc_id long, text string"
    )
    counters = {}
    rows = substring_dup_spans(
        docs, k=3, min_match_tokens=5, max_gram_freq=2, counters=counters
    ).collect()
    assert rows == []
    assert counters["grams_capped"] > 0
    assert counters["gram_rows_capped"] >= counters["grams_capped"] * 3
    # with the cap lifted every pair reports the boilerplate span
    rows = substring_dup_spans(docs, k=3, min_match_tokens=5).collect()
    assert len(rows) == 10  # C(5,2)


def test_substring_spans_rejects_min_below_k(spark):
    from pagerank_optimization_spark.operators.dedup import substring_dup_spans

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_dup_spans(docs, k=5, min_match_tokens=3)


# --- winnowing fingerprints ---------------------------------------------------


def _py_winnow(text: str, k: int, w: int):
    """Independent python recompute of all-argmin winnowing with the
    portable poly hash."""
    import re

    P, H0 = 1_125_899_906_842_597, 7
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    npos = max(len(norm) - k + 1, 1)
    hs = []
    for i in range(npos):
        h = H0
        for c in norm[i : i + k]:
            h = (h * 31 + ord(c)) % P
        hs.append(h)
    n = len(hs)
    starts = range(max(n - w + 1, 1))
    sel = set()
    for p in starts:
        frame = hs[p : p + w]
        mn = min(frame)
        for q, h in enumerate(frame):
            if h == mn:
                sel.add((p + q + 1, h))
    return sel


@pytest.mark.parametrize("k,w", [(7, 8), (3, 4)])
def test_winnow_matches_python(spark, k, w):
    from pagerank_optimization_spark.operators.dedup import winnow_fingerprints

    rows = [
        (0, "The quick brown fox jumps over the lazy dog near the river bank."),
        (1, "aaaaaaaaaaaaaaaaaaaa"),  # all-equal hashes: every position ties
        (2, "short"),                 # shorter than k
        (3, ""),                      # empty
        (4, "Spark SQL window functions partition rows and order them by position."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    for did, text in rows:
        assert got.get(did, set()) == _py_winnow(text, k, w), (did, k, w)


def test_winnow_guarantee_shared_substring(spark):
    """Two docs sharing a ≥ w+k−1-char normalized substring MUST share at
    least one fingerprint hash (the winnowing coverage property)."""
    from pagerank_optimization_spark.operators.dedup import winnow_fingerprints

    k, w = 7, 8
    shared = "the identical plagiarized passage lives right here in both documents"
    assert len(shared) >= w + k - 1
    rows = [
        (0, "Completely unrelated preamble text. " + shared + " And a distinct tail."),
        (1, "Other opening words entirely; " + shared + " with different closing."),
        (2, "No overlap with anything else at all in this one, truly unique words."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        fp.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert fp[0] & fp[1], "docs sharing a long substring must share a fingerprint"
    assert not (fp[0] & fp[2] and fp[1] & fp[2]) or True  # doc 2 may share rare grams; no assertion


def test_winnow_pairs_detects_planted_passage(spark):
    """Docs sharing a long passage pair up; unrelated docs don't; the
    hot-gram cap kills corpus-wide boilerplate signal."""
    from pagerank_optimization_spark.operators.dedup import winnow_pairs

    passage = "this exact plagiarized paragraph is long enough to guarantee many shared winnowing fingerprints between the two documents that contain it"
    boiler = " subscribe to our newsletter for updates"
    rows = [
        (0, "Intro words. " + passage + boiler),
        (1, "Different start! " + passage + boiler),
        (2, "Totally unrelated content about graph engines and parquet files." + boiler),
        (3, "Another unique document mentioning spark catalyst plans only." + boiler),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap 3 drops exactly the grams present in ALL four docs (the planted
    # boilerplate) while the two-doc passage survives — the cap IS the
    # boilerplate filter, not just a skew bound
    caps: dict = {}
    got = {
        (r.a, r.b): r.n_shared
        for r in winnow_pairs(
            docs, k=7, w=8, min_shared=3, max_gram_freq=3, counters=caps
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 3
    assert (2, 3) not in got
    assert caps["winnow_grams_capped"] > 0
    # uncapped: the boilerplate pairs everything with everything
    allp = {(r.a, r.b) for r in winnow_pairs(docs, k=7, w=8, min_shared=3).collect()}
    assert (2, 3) in allp
    # cap at 1: every fingerprint shared by >1 doc is dropped -> no pairs
    none = winnow_pairs(docs, k=7, w=8, min_shared=1, max_gram_freq=1)
    assert none.count() == 0
