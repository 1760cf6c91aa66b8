"""Warm-start scale probe: converged-PageRank wall and iteration savings
at >1M vertices when an evolving graph's recompute seeds from the
previous ranks instead of uniform.

Scenario: converge on the base graph (the 'yesterday' run), apply a
small deterministic edge delta (drop 1/DELTA_MOD of edges, re-normalize
weights — 'today's graph'), then converge cold (uniform x0) vs warm
(x0 = yesterday's ranks) on the same delta'd graph. The warm run starts
at the delta-induced distance from the new fixed point, so the
iteration count drops by log_{1/damping}(cold_dist/warm_dist) — a wall
saving that GROWS with graph size (each saved superstep is a full
gather-scatter over |E|).

Usage: python tools/warm_scale_probe.py  (env: PROBE_CONV, PROBE_CPUS,
PROBE_INPUT_DIR — shares the cached graph with scale_kernel_probe.py;
PROBE_DELTA_MOD, default 200 = 0.5% of edges dropped).
Writes BENCH/warm_scale_probe_<nconv>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("PROBE_CONV", "1100000"))
CPUS = int(os.environ.get("PROBE_CPUS", "32"))
INPUT_DIR = os.environ.get("PROBE_INPUT_DIR", "/tmp/scale_probe_input")
DELTA_MOD = int(os.environ.get("PROBE_DELTA_MOD", "200"))


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.pagerank import pagerank
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="warm-scale-probe", cores=CPUS, shuffle_partitions=CPUS)

    meta_path = f"{INPUT_DIR}/meta.json"
    if not (os.path.exists(meta_path) and json.load(open(meta_path)).get("n_conv") == N_CONV):
        print(f"preparing {N_CONV:,}-conv graph ...", file=sys.stderr, flush=True)
        v, e = build_graph(synthesize_transcripts(spark, N_CONV, seed=42))
        v.write.mode("overwrite").parquet(f"{INPUT_DIR}/vertices.parquet")
        e.write.mode("overwrite").parquet(f"{INPUT_DIR}/edges.parquet")
        json.dump({"n_conv": N_CONV}, open(meta_path, "w"))

    vertices = spark.read.parquet(f"{INPUT_DIR}/vertices.parquet").persist()
    edges = spark.read.parquet(f"{INPUT_DIR}/edges.parquet").persist()
    n_v, n_e = vertices.count(), edges.count()
    print(f"graph: |V|={n_v:,} |E|={n_e:,}", file=sys.stderr, flush=True)

    t0 = time.monotonic()
    base = pagerank(vertices, edges, tol=1e-6, partitions=CPUS)
    base_wall = time.monotonic() - t0
    base_ranks = base.ranks.persist()
    base_ranks.count()
    print(f"base: {base.iterations} iters {base_wall:.1f}s", file=sys.stderr, flush=True)

    # deterministic 1/DELTA_MOD edge drop + column-stochastic re-normalize
    kept = edges.where((F.xxhash64("src", "dst") % DELTA_MOD) != 0).select("src", "dst")
    outdeg = kept.groupBy("src").agg(F.count("*").alias("od"))
    edges2 = (
        kept.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("weight"))
        .persist()
    )
    n_e2 = edges2.count()

    t0 = time.monotonic()
    cold = pagerank(vertices, edges2, tol=1e-6, partitions=CPUS)
    cold_wall = time.monotonic() - t0
    print(f"cold: {cold.iterations} iters {cold_wall:.1f}s", file=sys.stderr, flush=True)

    t0 = time.monotonic()
    warm = pagerank(vertices, edges2, tol=1e-6, partitions=CPUS, x0=base_ranks)
    warm_wall = time.monotonic() - t0
    print(f"warm: {warm.iterations} iters {warm_wall:.1f}s", file=sys.stderr, flush=True)

    out = {
        "n_conv": N_CONV,
        "n_vertices": n_v,
        "n_edges": n_e,
        "n_edges_delta": n_e2,
        "delta_frac_dropped": round(1.0 - n_e2 / n_e, 5),
        "cpus": CPUS,
        "tol": 1e-6,
        "base": {"iterations": base.iterations, "wall_s": round(base_wall, 2)},
        "cold": {"iterations": cold.iterations, "wall_s": round(cold_wall, 2)},
        "warm": {"iterations": warm.iterations, "wall_s": round(warm_wall, 2)},
        "iter_saving": cold.iterations - warm.iterations,
        "wall_speedup": round(cold_wall / warm_wall, 3),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        f"warm_scale_probe_{N_CONV}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
