"""Bloom-filter decontamination: no-false-negatives law vs the exact
pass, python position replay, shard union-merge; token HLL: register
replay, zero-fill, shard max-merge, estimate accuracy vs exact."""

import hashlib
import math

from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.quality import (
    bloom_bits,
    bloom_contamination,
    contamination_flags,
)
from pagerank_optimization_spark.operators.vocab import hll_estimate, token_hll

BITS, HASHES, K = 1 << 16, 4, 3


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _pos(gram, i, salt="bf"):
    return _h48(f"{salt}:{i}:{gram}") % BITS


def test_python_position_replay(spark):
    bench = _docs(spark, ["alpha beta gamma delta"])
    got = {r["pos"] for r in bloom_bits(bench, k=K, bits=BITS, hashes=HASHES).collect()}
    want = {
        _pos(g, i)
        for g in ["alpha beta gamma", "beta gamma delta"]
        for i in range(HASHES)
    }
    assert got == want


def test_no_false_negatives_vs_exact(spark):
    # corpus docs 0..9 share trigrams with the benchmark; 10..19 are clean
    bench = _docs(spark, [f"shared phrase number {i} ends here" for i in range(10)])
    corpus = _docs(
        spark,
        [f"prefix shared phrase number {i} ends here suffix" for i in range(10)]
        + [f"totally unrelated clean text block {i} words" for i in range(10)],
        start=100,
    )
    exact = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in contamination_flags(corpus, bench, k=K).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged_shingles"]
        for r in bloom_contamination(
            corpus, bench, k=K, bits=BITS, hashes=HASHES
        ).collect()
    }
    assert set(exact) <= set(bloom)  # never misses a contaminated doc
    for d, n in exact.items():
        assert bloom[d] >= n  # per-doc flagged grams ⊇ exact hits
    assert set(exact) == {100 + i for i in range(10)}


def test_shard_union_merge(spark):
    a = _docs(spark, ["one two three four"])
    b = _docs(spark, ["five six seven eight"], start=10)
    whole = {
        r["pos"] for r in bloom_bits(a.union(b), k=K, bits=BITS, hashes=HASHES).collect()
    }
    parts = {
        r["pos"] for r in bloom_bits(a, k=K, bits=BITS, hashes=HASHES).collect()
    } | {r["pos"] for r in bloom_bits(b, k=K, bits=BITS, hashes=HASHES).collect()}
    assert whole == parts


def test_bloom_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_bits(_docs(spark, ["x y z"]), bits=0)
    with pytest.raises(ValueError):
        bloom_bits(_docs(spark, ["x y z"]), hashes=0)


P = 6  # small grid for replay tests; driver query uses p=8
M = 1 << P


def _hll_cell(token, salt="hll"):
    h = _h48(f"{salt}:{token}")
    reg, w = h % M, h >> P
    if w == 0:
        return reg, 48 - P + 1
    return reg, (w & -w).bit_length()  # log2(lowest set bit) + 1


def test_hll_register_replay_and_fill(spark):
    texts = ["aa bb cc", "cc dd"]
    rows = {r["reg"]: r["rho"] for r in token_hll(_docs(spark, texts), p=P).collect()}
    assert set(rows) == set(range(M))  # zero-filled to exactly 2^p rows
    want = {}
    for t in ["aa", "bb", "cc", "dd"]:
        reg, rho = _hll_cell(t)
        want[reg] = max(want.get(reg, 0), rho)
    for reg in range(M):
        assert rows[reg] == want.get(reg, 0)


def test_hll_shard_max_merge(spark):
    a, b = ["x y z w"], ["z w q r s"]
    whole = {r["reg"]: r["rho"] for r in token_hll(_docs(spark, a + b), p=P).collect()}
    sa = {r["reg"]: r["rho"] for r in token_hll(_docs(spark, a), p=P).collect()}
    sb = {r["reg"]: r["rho"] for r in token_hll(_docs(spark, b, start=5), p=P).collect()}
    assert whole == {reg: max(sa[reg], sb[reg]) for reg in range(M)}


def test_hll_estimate_tracks_exact(spark):
    texts = [" ".join(f"tok{7 * i + j}" for j in range(5)) for i in range(200)]
    docs = _docs(spark, texts)
    exact = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    est = hll_estimate(token_hll(docs, p=8), p=8)
    assert abs(est - exact) / exact < 3 * 1.04 / math.sqrt(256)


def test_hll_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        token_hll(_docs(spark, ["x"]), p=2)
