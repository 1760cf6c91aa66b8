"""Converged-run amortization A/B at >1M vertices (r4 VERDICT Next #6).

The auto-kernel dispatch keeps join-agg the >1M default partly because the
csr scale mode pays ~60s of one-time layout compile (DISTRIBUTE_DATA)
that a k0=10 bench run never amortizes. A CONVERGED run is ~76 supersteps
— compute dominates — so the margin call needs an amortized-wall check:
tol=1e-6 PageRank on a ~4M-vertex synthesized transcript graph, csr scale
mode (broadcast_frontier=False, COLD compile cache each trial — full
setup included) vs join-agg, INTERLEAVED min-of-N total walls in one warm
JVM.

Usage: python tools/converged_ab.py   (env: CONV_AB_TRIALS=2,
CONV_AB_NCONV=4000000, SPARK_GRAFT_CPUS) — prints one JSON line and
writes BENCH/converged_ab_4M.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.pagerank import pagerank
    from pagerank_optimization_spark.operators.pagerank_csr import clear_compile_cache
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("CONV_AB_TRIALS", "2"))
    n_conv = int(os.environ.get("CONV_AB_NCONV", "4000000"))

    spark = get_spark(app_name="converged-ab", cores=cpus, shuffle_partitions=cpus)
    tr = synthesize_transcripts(spark, n_conv, seed=42)
    vertices, edges = build_graph(tr)
    vertices, edges = vertices.persist(), edges.persist()
    n_v, n_e = vertices.count(), edges.count()
    assert n_v > 1_000_000, f"need a >1M-vertex graph, got {n_v:,}"

    def run_joinagg():
        return pagerank(vertices, edges, tol=1e-6, max_iter=100, partitions=cpus,
                        kernel="join-agg")

    def run_csr_scale():
        clear_compile_cache()  # wall INCLUDES the one-time layout compile
        return pagerank(vertices, edges, tol=1e-6, max_iter=100, partitions=cpus,
                        kernel="csr-blocks", csr_broadcast_frontier=False)

    arms = {"join_agg": run_joinagg, "csr_scale": run_csr_scale}
    # unmeasured JIT warmup: 2 fixed supersteps per kernel
    pagerank(vertices, edges, fixed_iters=2, partitions=cpus, kernel="join-agg")
    clear_compile_cache()
    pagerank(vertices, edges, fixed_iters=2, partitions=cpus,
             kernel="csr-blocks", csr_broadcast_frontier=False)

    walls: dict[str, list[float]] = {k: [] for k in arms}
    compute: dict[str, list[float]] = {k: [] for k in arms}
    iters: dict[str, int] = {}
    for t in range(trials):
        for name, fn in arms.items():  # interleaved
            t0 = time.monotonic()
            res = fn()
            dt = time.monotonic() - t0
            walls[name].append(round(dt, 3))
            compute[name].append(round(sum(m["wall_ms"] for m in res.metrics) / 1000.0, 3))
            iters[name] = res.iterations
            print(f"trial {t} {name}: wall {dt:.1f}s ({res.iterations} supersteps)",
                  file=sys.stderr, flush=True)

    mins = {k: min(v) for k, v in walls.items()}
    out = {
        "graph": {"n_conv": n_conv, "vertices": n_v, "edges": n_e, "cpus": cpus},
        "trials": trials,
        "supersteps": iters,
        "walls_s": walls,
        "compute_s": compute,
        "min_wall_s": mins,
        "min_compute_s": {k: min(v) for k, v in compute.items()},
        "csr_over_joinagg_wall_ratio": round(mins["csr_scale"] / mins["join_agg"], 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/converged_ab_4M.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
