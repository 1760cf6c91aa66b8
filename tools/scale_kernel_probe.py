"""Scale-mode kernel probe: join-agg vs csr-blocks(scale) on a >1M-vertex
graph, INTERLEAVED min-of-trials (round-3 ADVICE protocol: alternating
trials so ambient drift hits both kernels; this box carries 2-3× noise).

Round-3 context: the csr scale mode (merge-join routes + frontier shuffle +
pandas cogroup) measured 3.3× behind join-agg at 1.1M vertices, traced to
the pandas materialization at the JVM↔Python boundary. Round 4 replaced the
scale-mode kernel body with a cogrouped ``applyInArrow`` (columns stay
Arrow buffers both directions); this probe is the before/after evidence —
it reports per-kernel wall + compute-region minima AND the per-superstep
wall profile so the steady state is visible next to the one-time setup.

Usage: python tools/scale_kernel_probe.py   (env: PROBE_CONV, PROBE_TRIALS,
PROBE_K0, PROBE_CPUS, PROBE_INPUT_DIR). Writes BENCH/scale_kernel_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("PROBE_CONV", "1100000"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "3"))
K0 = int(os.environ.get("PROBE_K0", "10"))
CPUS = int(os.environ.get("PROBE_CPUS", "32"))
INPUT_DIR = os.environ.get("PROBE_INPUT_DIR", "/tmp/scale_probe_input")


def main() -> None:
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.pagerank import pagerank
    from pagerank_optimization_spark.operators.pagerank_csr import clear_compile_cache
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="scale-probe", cores=CPUS, shuffle_partitions=CPUS)

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
    assert n_v > 1_000_000, f"scale probe needs >1M vertices, got {n_v}"
    print(f"graph: |V|={n_v:,} |E|={n_e:,}", file=sys.stderr, flush=True)

    kernels = {
        "join-agg": lambda: pagerank(vertices, edges, fixed_iters=K0, partitions=CPUS),
        "csr-scale": lambda: pagerank(
            vertices, edges, fixed_iters=K0, partitions=CPUS,
            kernel="csr-blocks", csr_broadcast_frontier=False,
        ),
    }
    acc = {k: {"walls": [], "computes": [], "superstep_ms": []} for k in kernels}
    for t in range(TRIALS):
        for name, fn in kernels.items():  # interleaved: drift hits both
            clear_compile_cache()
            t0 = time.monotonic()
            res = fn()
            wall = time.monotonic() - t0
            comp = sum(m["wall_ms"] for m in res.metrics) / 1000.0
            acc[name]["walls"].append(round(wall, 3))
            acc[name]["computes"].append(round(comp, 3))
            acc[name]["superstep_ms"].append([round(m["wall_ms"]) for m in res.metrics])
            print(f"trial {t} {name}: wall {wall:.2f}s compute {comp:.2f}s",
                  file=sys.stderr, flush=True)

    out = {"n_conv": N_CONV, "vertices": n_v, "edges": n_e, "k0": K0,
           "cpus": CPUS, "trials": TRIALS,
           "protocol": "interleaved trials, cold compile cache per csr trial; "
                       "compute = summed per-superstep walls (setup excluded "
                       "for both kernels)"}
    for name, a in acc.items():
        key = name.replace("-", "_")
        cmin = min(a["computes"])
        out[key] = {
            "wall_s_min": min(a["walls"]),
            "compute_s_min": cmin,
            "walls_all": a["walls"],
            "computes_all": a["computes"],
            "edges_per_sec_per_superstep_compute": round(n_e * K0 / cmin),
            "superstep_ms_best_trial": a["superstep_ms"][a["computes"].index(cmin)],
        }
    out["csr_scale_vs_joinagg_compute_ratio"] = round(
        out["csr_scale"]["compute_s_min"] / out["join_agg"]["compute_s_min"], 3
    )
    os.makedirs("BENCH", exist_ok=True)
    with open(f"BENCH/scale_kernel_probe_{N_CONV}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
