"""synthesize_documents fixture tests: determinism, planted structure
(exact-dup groups, near-dup families, mega family), and — the point of the
fixture — that the dedup ladder's skew caps OBSERVABLY fire on it (the sf
corpus never triggers them, so until this fixture the caps were proven
only by planted-hub unit tests, r4 VERDICT Next #3)."""

import pytest

from pagerank_optimization_spark.operators.dedup import (
    dedup_cascade,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from pagerank_optimization_spark.sources.documents import synthesize_documents

N = 2000


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_documents(spark, N, seed=42).cache()


def test_deterministic(spark, corpus):
    a = sorted((r.doc_id, r.text) for r in corpus.collect())
    b = sorted((r.doc_id, r.text) for r in synthesize_documents(spark, N, seed=42).collect())
    assert a == b
    assert len(a) == N
    other = sorted(
        (r.doc_id, r.text) for r in synthesize_documents(spark, N, seed=7).collect()
    )
    assert a != other


def test_planted_exact_groups(corpus):
    """Band [mega, mega+N/10): groups of 5 identical docs → exact_dedup
    reports n_copies=5 with the group leader as canonical."""
    mega = min(800, N // 4)
    out = {r.doc_id: r for r in exact_dedup(corpus).collect()}
    for gid in range(mega, mega + N // 10, 5):
        group = [out[i] for i in range(gid, gid + 5)]
        assert all(r.n_copies == 5 for r in group)
        assert all(r.canonical_id == gid for r in group)
    # mega-family members are NOT exact dups (unique trailing token)
    assert out[0].n_copies == 1


def test_ngram_shingle_cap_fires(corpus):
    """The boilerplate prefix puts ~46% of docs behind shared shingles —
    doc frequency ≫ the cap, so the skew counter must be nonzero."""
    counters: dict = {}
    # cap 400 < mega-family size too, so the hot base shingles drop as well
    # (keeps the O(Σ f²) exact-Jaccard join small at unit-test scale)
    ngram_jaccard_pairs(corpus, k=3, threshold=0.8, max_shingle_freq=400,
                        counters=counters).count()
    assert counters["shingles_capped"] > 0
    assert counters["shingle_rows_capped"] > counters["shingles_capped"]


def test_minhash_bucket_cap_fires(corpus):
    """The mega near-dup family shares most band keys → band buckets larger
    than the cap exist and the counter fires."""
    mega = min(800, N // 4)
    counters: dict = {}
    minhash_lsh_pairs(corpus, threshold=0.5, max_bucket_size=mega // 2,
                      counters=counters).count()
    assert counters["buckets_capped"] > 0
    assert counters["bucket_rows_capped"] > mega // 2


def test_cascade_stages_remove_planted_families(corpus):
    """Stage attribution on the planted corpus: exact removes 4/5 of each
    exact group; minhash removes near-dup family members (3/4 per family,
    modulo bucket-cap escapes in the mega family)."""
    survivors, stats = dedup_cascade(corpus)
    by_stage = {s["stage"]: s for s in stats}
    n_exact_groups = (N // 10) // 5
    assert by_stage["exact"]["removed"] == n_exact_groups * 4
    assert by_stage["minhash_lsh"]["removed"] > 0
    assert by_stage["minhash_lsh"]["survivors"] == survivors.count()
