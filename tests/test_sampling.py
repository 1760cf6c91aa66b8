"""Differential tests for deterministic sampling + sequence packing.

The engine side (operators.sampling) and the DuckDB twins
(plans.oracle_sql_docs) implement the same portable MD5-bucket
threshold rule and the same global token-order packing; these tests run
both on the same sf0.01 documents table and require exact agreement —
plus the properties that make hash sampling the right primitive at
100 TB: run/partitioning invariance and sample nesting.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.sampling import (
    hash_sample,
    pack_documents,
    stratified_hash_sample,
)
from pagerank_optimization_spark.plans import oracle_sql_docs as osql

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def test_hash_sample_matches_duckdb_twin(docs, con):
    got = sorted(r.doc_id for r in hash_sample(docs, 0.1, "doc_id").collect())
    want = sorted(con.sql(osql.docs_hash_sample_sql(0.1)).df()["doc_id"])
    assert got == list(want)
    assert 0 < len(got) < docs.count()


def test_hash_sample_is_partitioning_invariant(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.2, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(17, "lang"), 0.2, "doc_id").collect()
    )
    assert a == b


def test_hash_sample_nests(docs):
    """A 5% sample is a subset of the 20% sample under the same salt —
    the composition property df.sample() lacks."""
    small = {r.doc_id for r in hash_sample(docs, 0.05, "doc_id").collect()}
    big = {r.doc_id for r in hash_sample(docs, 0.20, "doc_id").collect()}
    assert small <= big


def test_hash_sample_salt_decorrelates(docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id", salt="a").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id", salt="b").collect()}
    assert a != b  # different salts → different (overlapping) subsets
    n = docs.count()
    # each is still ≈30%
    for s in (a, b):
        assert 0.15 * n < len(s) < 0.45 * n


def test_hash_sample_rate_bounds(docs):
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")


def test_stratified_sample_matches_duckdb_twin(docs, con):
    rates = {"en": 0.5, "zh": 0.2}
    got = sorted(
        (r.doc_id, r.lang)
        for r in stratified_hash_sample(
            docs, rates, "lang", "doc_id", default_rate=0.05
        ).collect()
    )
    want = con.sql(osql.docs_stratified_sample_sql(rates, default_rate=0.05)).df()
    assert got == sorted(zip(want["doc_id"], want["lang"]))


def test_stratified_sample_rebalances(docs):
    rates = {"en": 0.5}
    out = stratified_hash_sample(docs, rates, "lang", "doc_id", default_rate=0.05)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # en kept at ≈50%, others at ≈5%
    assert 0.35 < per.get("en", 0) / base["en"] < 0.65
    other_kept = sum(v for k, v in per.items() if k != "en")
    other_base = sum(v for k, v in base.items() if k != "en")
    assert other_kept / other_base < 0.15


def test_pack_matches_duckdb_twin(docs, con):
    got = sorted(
        (r.doc_id, r.n_tok, r.bin_id, r.offset_in_bin, r.spans_boundary)
        for r in pack_documents(docs, 512).collect()
    )
    want = con.sql(osql.docs_pack_sql(512)).df()
    assert got == sorted(
        zip(
            want["doc_id"],
            want["n_tok"],
            want["bin_id"],
            want["offset_in_bin"],
            want["spans_boundary"],
        )
    )


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_pack_is_partition_count_invariant(docs, parts):
    """The two-level prefix scan must produce the SAME bin assignment no
    matter how many range partitions the scan used — the operator's
    core contract (a resumed/rescaled job re-packs identically)."""
    base = sorted(
        (r.doc_id, r.bin_id, r.offset_in_bin)
        for r in pack_documents(docs, 256, partitions=8).collect()
    )
    other = sorted(
        (r.doc_id, r.bin_id, r.offset_in_bin)
        for r in pack_documents(docs, 256, partitions=parts).collect()
    )
    assert base == other


def test_pack_bins_are_dense_and_ordered(docs):
    rows = sorted(
        (r.doc_id, r.n_tok, r.bin_id, r.offset_in_bin)
        for r in pack_documents(docs, 512).collect()
    )
    # reconstruct the global running offset and re-derive every column
    start = 0
    for doc_id, n_tok, bin_id, off in rows:
        assert bin_id == start // 512
        assert off == start % 512
        start += n_tok


def test_pack_budget_validation(docs):
    with pytest.raises(ValueError):
        pack_documents(docs, 0)


def test_source_mix_weights_match_python(spark):
    from pagerank_optimization_spark.operators.sampling import source_mix_weights

    rows = [(i, "tok " * (5 + i % 4), ["web", "code", "chat"][i % 3], "en")
            for i in range(45)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    got = {r.source: r for r in
           source_mix_weights(docs, alpha=0.7, token_budget=10_000).collect()}
    tok = {}
    nd = {}
    for _i, t, s, _l in rows:
        tok[s] = tok.get(s, 0) + len(t.split())
        nd[s] = nd.get(s, 0) + 1
    grand = sum(tok.values())
    z = sum(v**0.7 for v in tok.values())
    assert set(got) == set(tok)
    for s, r in got.items():
        assert r.n_docs == nd[s] and r.total_tokens == tok[s]
        assert abs(r.natural_share - round(tok[s] / grand, 8)) < 1e-12
        w = tok[s] ** 0.7 / z
        assert abs(r.weight - round(w, 8)) < 1e-12
        assert abs(r.epochs - round(10_000 * w / tok[s], 8)) < 1e-12
    # weights sum to 1; alpha<1 upsamples the smallest source
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-6
    smallest = min(tok, key=tok.get)
    assert got[smallest].weight > tok[smallest] / grand - 1e-12


def test_source_mix_weights_alpha_extremes(spark):
    from pagerank_optimization_spark.operators.sampling import source_mix_weights

    rows = [(0, "a " * 10, "s1", "en"), (1, "a " * 90, "s2", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    # alpha=1: natural shares
    w1 = {r.source: r.weight for r in source_mix_weights(docs, alpha=1.0).collect()}
    assert abs(w1["s1"] - 0.1) < 1e-9 and abs(w1["s2"] - 0.9) < 1e-9
    # alpha=0: uniform
    w0 = {r.source: r.weight for r in source_mix_weights(docs, alpha=0.0).collect()}
    assert abs(w0["s1"] - 0.5) < 1e-9 and abs(w0["s2"] - 0.5) < 1e-9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        source_mix_weights(docs, alpha=-0.1)


def test_chunk_documents_matches_python(spark):
    from pagerank_optimization_spark.operators.sampling import chunk_documents

    texts = {
        0: "a b c d e f g h i j",   # 10 toks
        1: "one two three",          # 3 toks
        2: "",                       # empty -> no chunks
        3: "solo",                   # 1 tok
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r.doc_id, r.chunk_idx): (r.n_tok, r.chunk_text)
           for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()}
    want = {}
    stride = 3
    for did, t in texts.items():
        toks = t.split()
        i = 0
        idx = 0
        while i < len(toks):
            ch = toks[i:i + 4]
            want[(did, idx)] = (len(ch), " ".join(ch))
            i += stride
            idx += 1
    assert got == want
    # every token position is covered; consecutive chunks overlap by 1
    r0 = got[(0, 0)][1].split(); r1 = got[(0, 1)][1].split()
    assert r0[-1] == r1[0]


def test_chunk_documents_no_overlap_and_guards(spark):
    from pagerank_optimization_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, chunk_tokens=2, overlap=0).collect(),
                  key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in rows] == ["a b", "c d", "e"]
    # min_tokens drops the short tail
    rows2 = chunk_documents(docs, chunk_tokens=2, overlap=0, min_tokens=2).collect()
    assert len(rows2) == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
