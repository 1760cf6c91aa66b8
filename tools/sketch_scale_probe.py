"""Sketch-family corpus-scale probe: count-min / token-HLL / Bloom
decontamination / DSIR weights on synthesized corpora at several sizes.

The sf0.1 bench rows run these on the 5k-doc corpus where every wall is
job-overhead-bound; this probe is the 100 TB-slope evidence: docs/sec
must RISE with corpus size for the fixed-state sketches (the state —
4×1024 count-min grid, 2^8 HLL registers, 2^20 Bloom positions, dim-row
DSIR model — does not grow with the corpus, so the cost per doc is one
corpus pass amortizing fixed overhead), and the Bloom pass must hold
its lead over exact contamination as the benchmark side grows.

Usage: python tools/sketch_scale_probe.py   (env: PROBE_SIZES
comma-separated doc counts, default 5000,50000,250000; PROBE_CPUS).
Writes BENCH/sketch_scale_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(s) for s in os.environ.get("PROBE_SIZES", "5000,50000,250000").split(",")]
CPUS = int(os.environ.get("PROBE_CPUS", "32"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.dsir import dsir_logratios
    from pagerank_optimization_spark.operators.quality import (
        bloom_contamination,
        contamination_flags,
    )
    from pagerank_optimization_spark.operators.sampling import (
        SAMPLE_DENOM,
        _sample_bucket,
    )
    from pagerank_optimization_spark.operators.vocab import token_countmin, token_hll
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.documents import synthesize_documents

    spark = get_spark(app_name="sketch-scale-probe", cores=CPUS)
    out: dict = {"sizes": SIZES, "cpus": CPUS, "trials": TRIALS, "rows": []}

    def timed_min(fn):
        best = None
        for _ in range(TRIALS):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return best

    bkt = _sample_bucket(F.col("doc_id"), "bench")
    thr = int(0.02 * SAMPLE_DENOM)
    for n in SIZES:
        docs = synthesize_documents(spark, n, seed=42).persist()
        docs.count()
        raw, bench = docs.where(bkt >= thr), docs.where(bkt < thr)
        row = {"n_docs": n}
        # forcing discipline (see bench.py): operators ending in a
        # densifying ids⟕agg left join must be forced with a SUM over an
        # output column — .count() lets Catalyst skip the computation
        for name, fn in [
            ("countmin", lambda: token_countmin(docs, depth=4, width=1024).count()),
            (
                "token_hll",
                lambda: token_hll(docs, p=8).agg(F.sum("rho")).collect(),
            ),
            (
                "bloom_contam",
                lambda: bloom_contamination(raw, bench, k=4).count(),
            ),
            (
                "exact_contam",
                lambda: contamination_flags(raw, bench, k=4).count(),
            ),
            (
                "dsir",
                lambda: dsir_logratios(raw, bench, dim=4096)
                .agg(F.sum("logw"))
                .collect(),
            ),
        ]:
            w = timed_min(fn)
            row[name] = {"wall_s_min": round(w, 3), "docs_per_sec": round(n / w)}
            print(f"n={n} {name}: {w:.2f}s ({round(n / w)} docs/sec)", flush=True)
        out["rows"].append(row)
        docs.unpersist()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "sketch_scale_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
