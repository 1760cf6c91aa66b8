"""Count-min sketch: one-sided error law vs the exact histogram, python
hash replay, sketch linearity (shard merge = cell-wise add), and
absent-token zero estimates."""

import hashlib

from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.vocab import (
    countmin_lookup,
    token_countmin,
)

DEPTH, WIDTH = 4, 256


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _cell(d, token, salt="cm"):
    h = int(hashlib.md5(f"{salt}:{d}:{token}".encode()).hexdigest()[:12], 16)
    return h % WIDTH


def test_python_hash_replay_and_totals(spark):
    texts = ["a b b c", "c c d"]
    rows = token_countmin(_docs(spark, texts), depth=DEPTH, width=WIDTH).collect()
    # every row's total mass = total token occurrences
    by_d = {}
    for r in rows:
        by_d.setdefault(r["d"], 0)
        by_d[r["d"]] += r["cnt"]
    assert by_d == {d: 7 for d in range(DEPTH)}
    # replay cell addresses for a known token
    got = {(r["d"], r["col"]): r["cnt"] for r in rows}
    for d in range(DEPTH):
        assert got[(d, _cell(d, "c"))] >= 3


def test_one_sided_error_vs_exact(spark):
    texts = [f"tok{i % 37} tok{i % 11} filler" for i in range(300)]
    docs = _docs(spark, texts)
    sketch = token_countmin(docs, depth=DEPTH, width=WIDTH).persist()
    exact = {
        r["token"]: r["cnt"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_total = sum(exact.values())
    probe = list(exact)[:20]
    est = {
        r["token"]: r["est"]
        for r in countmin_lookup(sketch, probe, depth=DEPTH, width=WIDTH).collect()
    }
    for t in probe:
        assert est[t] >= exact[t]  # never undercounts
        assert est[t] <= exact[t] + (3 * n_total) // WIDTH  # CM bound, loose


def test_absent_token_estimate(spark):
    sketch = token_countmin(_docs(spark, ["a b c"]), depth=DEPTH, width=WIDTH)
    est = countmin_lookup(
        sketch, ["zzz-not-present"], depth=DEPTH, width=WIDTH
    ).collect()[0]["est"]
    # an absent token can only collide into occupied cells — tiny corpus,
    # 4 independent rows of 256 cells: expect the min to be 0
    assert est == 0


def test_linearity_shard_merge(spark):
    a = ["x y", "y z"]
    b = ["z z w"]
    whole = {
        (r["d"], r["col"]): r["cnt"]
        for r in token_countmin(_docs(spark, a + b), depth=DEPTH, width=WIDTH).collect()
    }
    sa = token_countmin(_docs(spark, a), depth=DEPTH, width=WIDTH)
    sb = token_countmin(_docs(spark, b), depth=DEPTH, width=WIDTH)
    merged = {
        (r["d"], r["col"]): r["s"]
        for r in sa.unionByName(sb)
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    assert merged == whole
