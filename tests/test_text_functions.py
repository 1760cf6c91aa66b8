"""Text-analysis function tests (token count, quality, language ID,
fingerprint) against hand-computed expectations."""

from pyspark.sql import functions as F

from pagerank_optimization_spark.functions.text import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    subword_count_expr,
    token_count_expr,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text string").select(expr.alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "the quick  brown fox", token_count_expr(F.col("text"))) == 4
    assert _one(spark, "   ", token_count_expr(F.col("text"))) == 0
    assert _one(spark, "one", token_count_expr(F.col("text"))) == 1


def test_subword_count(spark):
    # "internationalization" → ceil(20/4)=5 pieces; "hi!" → hi(1) + !(1)
    assert _one(spark, "internationalization", subword_count_expr(F.col("text"))) == 5
    assert _one(spark, "hi!", subword_count_expr(F.col("text"))) == 2


def test_lang_id(spark):
    assert _one(spark, "the cat sat of the mat and it is that", lang_id_expr(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", lang_id_expr(F.col("text"))) == "de"
    assert _one(spark, "le chat est dans la maison et les chiens", lang_id_expr(F.col("text"))) == "fr"
    assert _one(spark, "el perro y la casa es una que", lang_id_expr(F.col("text"))) == "es"
    assert _one(spark, "zzz qqq xxx", lang_id_expr(F.col("text"))) == "und"


def test_quality_score_bounds_and_order(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the green hill " * 8
    bad = "@@@ ### !!! ??? %%% ^^^ &&&"
    qg = _one(spark, good, quality_score_expr(F.col("text")))
    qb = _one(spark, bad, quality_score_expr(F.col("text")))
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello,   World!", fingerprint_expr(F.col("text")))
    b = _one(spark, "hello world", fingerprint_expr(F.col("text")))
    c = _one(spark, "hello worlds", fingerprint_expr(F.col("text")))
    assert a == b
    assert a != c


def test_functions_run_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_tok"),
        quality_score_expr(F.col("text")).alias("q"),
        lang_id_expr(F.col("text")).alias("lang"),
        fingerprint_expr(F.col("text")).alias("fp"),
    ).collect()
    assert len(out) > 0
    assert all(r.n_tok > 0 and 0 <= r.q <= 1 and r.lang in ("en", "de", "fr", "es", "und") for r in out)
