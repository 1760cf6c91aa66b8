"""DSIR importance weights: exact python differential (poly-hash +
smoothed log-ratio replay), directional law (target-like docs score
higher), zero-feature handling, validation, and resampling composition."""

import math

import pytest

from pagerank_optimization_spark.functions.text import POLY_H0, POLY_P
from pagerank_optimization_spark.operators.dsir import dsir_logratios

DIM, K = 64, 0.5


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _poly(s: str) -> int:
    h = POLY_H0
    for c in s:
        h = (h * 31 + ord(c)) % POLY_P
    return h


def _feats(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _expected(raw_texts, tgt_texts, ids):
    cf_t, cf_r = {}, {}
    for t in tgt_texts:
        for f in _feats(t):
            b = _poly(f) % DIM
            cf_t[b] = cf_t.get(b, 0) + 1
    for t in raw_texts:
        for f in _feats(t):
            b = _poly(f) % DIM
            cf_r[b] = cf_r.get(b, 0) + 1
    t_t, t_r = sum(cf_t.values()), sum(cf_r.values())
    lr = {
        b: math.log((cf_t.get(b, 0) + K) / (t_t + K * DIM))
        - math.log((cf_r.get(b, 0) + K) / (t_r + K * DIM))
        for b in range(DIM)
    }
    out = {}
    for i, t in zip(ids, raw_texts):
        fs = _feats(t)
        out[i] = (len(fs), sum(lr[_poly(f) % DIM] for f in fs))
    return out


def test_python_differential(spark):
    tgt = ["medical study of heart disease", "clinical heart trial results"]
    raw = [
        "medical heart disease treatment study",
        "cheap pills buy now best price",
        "weather report sunny with clouds",
        "",
    ]
    got = {
        r["doc_id"]: r
        for r in dsir_logratios(
            _docs(spark, raw), _docs(spark, tgt, start=100), dim=DIM, k=K
        ).collect()
    }
    want = _expected(raw, tgt, range(len(raw)))
    assert len(got) == len(raw)
    for i, (n_feat, logw) in want.items():
        assert got[i]["n_feat"] == n_feat
        assert abs(got[i]["logw"] - round(logw, 6)) < 1e-6
        if n_feat:
            assert abs(got[i]["logw_per_feat"] - round(logw / n_feat, 6)) < 1e-6
        else:
            assert got[i]["logw"] == 0.0 and got[i]["logw_per_feat"] == 0.0


def test_directional_law(spark):
    # raw pool: half medical (target-like), half spam — the medical half
    # must dominate the per-feature ranking
    tgt = [f"clinical heart study trial {i}" for i in range(6)]
    med = [f"heart study clinical outcome {i}" for i in range(5)]
    spam = [f"buy cheap pills discount code {i}" for i in range(5)]
    res = dsir_logratios(
        _docs(spark, med + spam), _docs(spark, tgt, start=100), dim=256, k=K
    ).collect()
    scores = {r["doc_id"]: r["logw_per_feat"] for r in res}
    assert min(scores[i] for i in range(5)) > max(scores[i] for i in range(5, 10))


def test_validation(spark):
    d = _docs(spark, ["x"])
    with pytest.raises(ValueError):
        dsir_logratios(d, d, dim=0)
    with pytest.raises(ValueError):
        dsir_logratios(d, d, k=0)


def test_resampling_composition(spark):
    # the paper's selection step: exp(logw_per_feat / T) as reservoir
    # weight — the fixed-size sample must over-represent target-like docs
    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    tgt = [f"clinical heart study trial {i}" for i in range(6)]
    med = [f"heart study clinical outcome {i}" for i in range(8)]
    spam = [f"buy cheap pills discount code {i}" for i in range(8)]
    w = dsir_logratios(
        _docs(spark, med + spam), _docs(spark, tgt, start=100), dim=256, k=K
    ).select("doc_id", F.exp(F.col("logw_per_feat") / F.lit(0.1)).alias("w"))
    picked = {
        r["doc_id"]
        for r in weighted_reservoir_sample(w, 6, F.col("w"), "doc_id").collect()
    }
    assert len(picked) == 6
    assert len([i for i in picked if i < 8]) >= 5  # target-like dominates
