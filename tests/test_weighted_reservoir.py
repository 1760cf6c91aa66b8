"""Efraimidis–Spirakis weighted reservoir sample: python replay of the
exact score, fixed size, weight-law sanity, partition invariance, and
ineligible-row semantics."""

import hashlib
import math

from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.sampling import (
    weighted_reservoir_sample,
)


def _score(key, w, salt=""):
    h = int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:12], 16)
    return math.log((h + 1) / float(1 << 48)) / w


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, w double")


def test_python_replay_exact(spark):
    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    got = weighted_reservoir_sample(
        _df(spark, rows), 25, F.col("w"), "id", salt="t"
    ).collect()
    assert len(got) == 25
    want = sorted(rows, key=lambda r: (-_score(r[0], r[1], "t"), r[0]))[:25]
    assert [r["id"] for r in got] == [i for i, _ in want]
    for r in got:
        assert r["es_key"] == round(_score(r["id"], r["w"], "t"), 8)


def test_weight_law(spark):
    # two strata, weight ratio 50:1 — the heavy stratum must dominate
    rows = [(i, 50.0) for i in range(100)] + [(i, 1.0) for i in range(100, 200)]
    got = weighted_reservoir_sample(_df(spark, rows), 40, F.col("w"), "id").collect()
    heavy = sum(1 for r in got if r["id"] < 100)
    assert heavy >= 35


def test_partition_invariance(spark):
    rows = [(i, float(1 + (i * i) % 11)) for i in range(500)]
    base = None
    for p in (1, 3, 16):
        got = weighted_reservoir_sample(
            _df(spark, rows).repartition(p), 30, F.col("w"), "id"
        ).collect()
        ids = sorted(r["id"] for r in got)
        base = base or ids
        assert ids == base


def test_nonpositive_and_null_weights_ineligible(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    got = weighted_reservoir_sample(
        spark.createDataFrame(rows, "id long, w double"), 10, F.col("w"), "id"
    ).collect()
    assert sorted(r["id"] for r in got) == [1, 5]


def test_sample_smaller_than_n(spark):
    got = weighted_reservoir_sample(
        _df(spark, [(1, 1.0), (2, 1.0)]), 10, F.col("w"), "id"
    ).collect()
    assert len(got) == 2
