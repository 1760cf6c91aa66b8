"""Differential + property tests for the corpus-quality operators
(repetition stats, per-source caps, benchmark decontamination).

Each operator runs against its DuckDB twin on sf0.01 documents; the
salted two-stage top-N is additionally cross-checked against a naive
single-window Spark implementation (the plan the salting replaces), and
repetition stats get hand-built multi-line documents because the
synthetic corpus is single-line (dup_line_frac would otherwise never
leave zero in any automated check).
"""

import duckdb
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pagerank_optimization_spark.functions.text import quality_score_expr
from pagerank_optimization_spark.operators.quality import (
    contamination_flags,
    repetition_stats,
    source_cap,
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


def test_repetition_matches_duckdb_twin(docs, con):
    got = sorted(
        (r.doc_id, r.n_lines, r.dup_line_frac, r.total_grams, r.top_ngram_frac)
        for r in repetition_stats(docs, ngram_n=2).collect()
    )
    want = con.sql(osql.docs_repetition_sql(ngram_n=2)).df()
    assert got == sorted(
        zip(
            want["doc_id"],
            want["n_lines"],
            want["dup_line_frac"],
            want["total_grams"],
            want["top_ngram_frac"],
        )
    )


def test_repetition_handcrafted_lines(spark):
    rows = [
        (1, "aa bb\naa bb\ncc dd\n\n  \n"),  # 3 nonblank lines, 1 dup
        (2, "xx yy zz"),  # single line, no dup
        (3, ""),  # empty text
        (4, "w\nw\nw\nw"),  # all identical
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df, ngram_n=2).collect()}
    assert out[1].n_lines == 3 and out[1].dup_line_frac == round(1 / 3, 8)
    assert out[2].n_lines == 1 and out[2].dup_line_frac == 0.0
    assert out[3].n_lines == 0 and out[3].dup_line_frac == 0.0
    assert out[3].total_grams == 0 and out[3].top_ngram_frac == 0.0
    assert out[4].dup_line_frac == 0.75
    # doc 4 tokens: w w w w → 2-grams 'w w' ×3 → top gram owns all of them
    assert out[4].total_grams == 3 and out[4].top_ngram_frac == 1.0
    # doc 1: grams = [aa bb, bb aa, aa bb, bb cc, cc dd] (lines are NOT
    # gram boundaries under whitespace tokenization) → max 2 of 5
    assert out[1].total_grams == 5 and out[1].top_ngram_frac == 0.4


def test_source_cap_matches_duckdb_twin(docs, con):
    got = sorted(
        (r.doc_id, r.source, r.score, r.rank)
        for r in source_cap(docs, 20).collect()
    )
    want = con.sql(osql.docs_source_cap_sql(20)).df()
    assert got == sorted(
        zip(want["doc_id"], want["source"], want["score"], want["rank"])
    )


@pytest.mark.parametrize("buckets", [1, 4, 32])
def test_source_cap_equals_naive_window(docs, buckets):
    """The two-stage salted top-N must equal the naive single-window
    top-N for ANY salt bucket count — the containment proof in code."""
    naive = (
        docs.select(
            "doc_id", "source", quality_score_expr(F.col("text")).alias("score")
        )
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("source").orderBy(
                    F.col("score").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    salted = source_cap(docs, 5, salt_buckets=buckets)
    a = sorted(map(tuple, naive.select(*salted.columns).collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_source_cap_validation(docs):
    with pytest.raises(ValueError):
        source_cap(docs, 0)


def test_contamination_matches_duckdb_twin(spark, docs, con):
    from pagerank_optimization_spark.operators.sampling import (
        SAMPLE_DENOM,
        _sample_bucket,
    )

    bkt = _sample_bucket(F.col("doc_id"), "bench")
    thr = int(0.02 * SAMPLE_DENOM)
    got = sorted(
        (r.doc_id, r.n_hit_shingles)
        for r in contamination_flags(
            docs.where(bkt >= thr), docs.where(bkt < thr), k=4
        ).collect()
    )
    want = con.sql(osql.docs_contamination_sql(k=4, bench_rate=0.02)).df()
    assert got == sorted(zip(want["doc_id"], want["n_hit_shingles"]))
    assert len(got) > 0  # the sf0.01 corpus genuinely collides at k=4


def test_contamination_flags_are_true_collisions(spark):
    """Every flagged doc shares ≥1 word k-gram with some benchmark doc;
    clean docs are absent."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox ran away"),  # shares 'quick brown fox'
            (2, "entirely unrelated words here"),  # clean
            (3, "the quick brown fox jumps again and the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hit_shingles for r in contamination_flags(corpus, bench, k=3).collect()}
    assert set(out) == {1, 3}
    assert out[1] == 1  # only 'quick brown fox'
    # doc 3 shares: 'the quick brown', 'quick brown fox', 'brown fox jumps'
    # (distinct shingles per doc — multiplicity collapsed)
    assert out[3] == 3


def test_contamination_plan_broadcasts_benchmark(spark, docs):
    """The benchmark side must enter as a broadcast hash join — the
    corpus (100 TB) side never shuffles for the semi-join."""
    bench = docs.limit(10)
    plan = contamination_flags(docs, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dedup_lines_matches_duckdb_twin(docs, con):
    from pagerank_optimization_spark.operators.quality import dedup_lines

    got = sorted(
        (r.doc_id, r.text_clean, r.n_lines_kept, r.n_lines_dropped)
        for r in dedup_lines(docs).collect()
    )
    want = con.sql(osql.docs_dedup_lines_sql()).df()
    assert got == sorted(
        zip(
            want["doc_id"],
            want["text_clean"],
            want["n_lines_kept"],
            want["n_lines_dropped"],
        )
    )


def test_dedup_lines_keep_first_semantics(spark):
    from pagerank_optimization_spark.operators.quality import dedup_lines

    rows = [
        (1, "alpha beta\nshared line\ngamma"),
        (2, "Shared, LINE!\nunique two"),  # normalized dup of doc 1's line
        (3, "echo\necho\nfoxtrot"),  # intra-doc dup
        (4, "shared line"),  # whole doc is a dup → empty survivor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines(df).collect()}
    assert out[1].text_clean == "alpha beta\nshared line\ngamma"
    assert out[1].n_lines_dropped == 0
    # doc 2 loses its case/punct variant of the shared line, keeps the rest
    assert out[2].text_clean == "unique two"
    assert (out[2].n_lines_kept, out[2].n_lines_dropped) == (1, 1)
    # intra-doc: first 'echo' survives, second dropped, order preserved
    assert out[3].text_clean == "echo\nfoxtrot"
    assert out[4].text_clean == "" and out[4].n_lines_kept == 0


def test_dedup_lines_boilerplate_cap(spark):
    from pagerank_optimization_spark.operators.quality import dedup_lines

    rows = [(i, "COOKIE BANNER\nbody %d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counters = {}
    out = {
        r.doc_id: r
        for r in dedup_lines(df, max_line_freq=5, counters=counters).collect()
    }
    # banner appears 10 > 5 times: dropped everywhere, incl. first occurrence
    assert all("COOKIE" not in out[i].text_clean for i in range(10))
    assert out[0].text_clean == "body 0"
    assert counters == {"boilerplate_lines": 1, "boilerplate_rows": 10}


def test_dedup_lines_plan_combines_before_shuffle(docs):
    """The keep-first winner agg must partially combine map-side (a
    billion-copy boilerplate line reduces to <=P rows pre-shuffle). Spark
    plans struct-min as SortAggregate — the partial_min phase before the
    exchange is the property the 100 TB claim rides on."""
    from pagerank_optimization_spark.operators.quality import dedup_lines

    plan = dedup_lines(docs)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min(struct(doc_id" in plan


def test_source_cap_plan_salts_stage_one(docs):
    """Stage 1's window must partition by (source, salt), never by source
    alone — otherwise a hot domain funnels through one task and the
    two-stage construction is decorative."""
    from pagerank_optimization_spark.operators.quality import source_cap

    plan = source_cap(docs, 5)._jdf.queryExecution().executedPlan().toString()
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l.lower() or "Window" in l]
    assert any("_salt" in l for l in specs), plan[:2000]


def test_corpus_profile_matches_numpy(spark):
    """corpus_profile(exact=True) vs numpy type-7 percentiles per group."""
    import numpy as np
    from pagerank_optimization_spark.operators.quality import corpus_profile

    rows = [
        (i, "w " * (i % 7 + 1) + "end", "s%d" % (i % 3), "en")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    got = {r.source: r for r in corpus_profile(docs).collect()}
    assert set(got) == {"s0", "s1", "s2"}
    for s in got:
        toks = np.array([len(t.split()) for (_i, t, src, _l) in rows if src == s])
        chars = np.array([len(t) for (_i, t, src, _l) in rows if src == s])
        r = got[s]
        assert r.n_docs == len(toks)
        assert r.total_tokens == int(toks.sum())
        assert abs(r.avg_chars - round(float(chars.mean()), 6)) < 1e-9
        for p, col in [(50, r.p50_tok), (90, r.p90_tok), (99, r.p99_tok)]:
            assert abs(col - round(float(np.percentile(toks, p)), 6)) < 1e-9, (s, p)


def test_corpus_profile_approx_close_to_exact(spark):
    """The 100 TB path (approx_percentile sketch) tracks exact within the
    sketch accuracy on a small group."""
    from pagerank_optimization_spark.operators.quality import corpus_profile

    rows = [(i, "w " * (i % 50 + 1), "s", "en") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    ex = corpus_profile(docs, exact=True).collect()[0]
    ap = corpus_profile(docs, exact=False).collect()[0]
    assert ap.n_docs == ex.n_docs and ap.total_tokens == ex.total_tokens
    for a, b in [(ap.p50_tok, ex.p50_tok), (ap.p90_tok, ex.p90_tok), (ap.p99_tok, ex.p99_tok)]:
        assert abs(a - b) <= 2.0  # integer-valued distribution, sketch ±accuracy


def test_gopher_flags_match_python(spark):
    import re

    from pagerank_optimization_spark.functions.text import STOPWORDS
    from pagerank_optimization_spark.operators.quality import gopher_quality_flags

    texts = {
        0: "the quick brown fox jumps over the lazy dog and " * 8,  # passes
        1: "short doc only",                                          # fails words
        2: "- item one\n- item two\n- item three",                    # bullets
        3: "trailing thought...\nanother one...\nplain line",         # ellipses
        4: "### #### ##### " + "the of and to a in is " * 10,         # symbols
        5: "12345 67890 00000 11111 " * 20,                           # alpha frac
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    for did, t in texts.items():
        toks = [w for w in t.lower().split() if w]
        lines = [l.strip() for l in t.split("\n") if l.strip()]
        r = got[did]
        assert r.n_words == len(toks), did
        mwl = sum(len(w) for w in toks) / max(len(toks), 1)
        assert abs(r.mean_word_len - round(mwl, 6)) < 1e-9, did
        sym = sum(t.count(c) for c in "#…") / max(len(toks), 1)
        assert abs(r.symbol_word_ratio - round(sym, 6)) < 1e-9, did
        bf = sum(bool(re.match(r"^\s*([-*•]|\d+[.)])", l)) for l in lines) / max(len(lines), 1)
        assert abs(r.bullet_line_frac - round(bf, 6)) < 1e-9, did
        ef = sum(bool(re.search(r"(\.\.\.|…)\s*$", l)) for l in lines) / max(len(lines), 1)
        assert abs(r.ellipsis_line_frac - round(ef, 6)) < 1e-9, did
        af = sum(bool(re.search(r"[a-z]", w)) for w in toks) / max(len(toks), 1)
        assert abs(r.alpha_word_frac - round(af, 6)) < 1e-9, did
        sh = len(set(toks) & set(STOPWORDS["en"]))
        assert r.stopword_hits == sh, did
    assert got[0].pass_all
    assert not got[1].pass_words
    assert got[2].bullet_line_frac == 1.0
    assert not got[3].pass_ellipsis
    assert not got[4].pass_symbol
    assert not got[5].pass_alpha
