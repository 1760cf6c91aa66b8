"""Properties of incremental dedup (new batch vs corpus): exact matches
drop at stage 1, near-dups at stage 2, novel docs survive, corpus always
wins, and within-batch duplicates deliberately pass through (that is
dedup_cascade's job)."""

import pytest

from pagerank_optimization_spark.operators.dedup import dedup_against_corpus

CORPUS_TEXT = (
    "the quick brown fox jumps over the lazy dog near the quiet river bank "
    "while the morning sun rises slowly over the distant green hills today"
)
NEAR_DUP = CORPUS_TEXT.replace("quiet river", "quiet mountain")
NOVEL = (
    "completely different content about spark partitions shuffle joins "
    "aggregations codegen arrow batches executors drivers stages and tasks"
)


@pytest.fixture(scope="module")
def split(spark):
    corpus = spark.createDataFrame(
        [
            (0, CORPUS_TEXT),
            (
                1,
                "unrelated corpus article describing medieval castle "
                "architecture with stone towers moats drawbridges and "
                "fortified gates built centuries ago across europe",
            ),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, CORPUS_TEXT),        # exact match of corpus 0
            (101, NEAR_DUP),           # near-dup of corpus 0
            (102, NOVEL),              # genuinely new
            (103, NOVEL),              # within-batch dup of 102 — must survive
        ],
        "doc_id long, text string",
    )
    return new.cache(), corpus.cache()


@pytest.mark.parametrize("hasher", ["xxhash64", "portable"])
def test_stage_semantics(split, hasher):
    new, corpus = split
    surv, stats = dedup_against_corpus(
        new, corpus, threshold=0.5, hasher=hasher
    )
    ids = sorted(r.doc_id for r in surv.collect())
    assert ids == [102, 103]  # exact and near-dup dropped; both novels kept
    assert [s["stage"] for s in stats] == ["exact", "minhash_vs_corpus"]
    assert stats[0]["removed"] == 1  # 100
    assert stats[1]["removed"] == 1  # 101
    assert stats[1]["survivors"] == 2


def test_empty_corpus_keeps_everything(split, spark):
    new, _ = split
    empty = spark.createDataFrame([], "doc_id long, text string")
    surv, stats = dedup_against_corpus(new, empty)
    assert surv.count() == new.count()
    assert all(s["removed"] == 0 for s in stats)


def test_original_columns_preserved(split, spark):
    new, corpus = split
    new2 = new.withColumn("extra", new.doc_id * 2)
    surv, _ = dedup_against_corpus(new2, corpus)
    assert set(surv.columns) == {"doc_id", "text", "extra"}
