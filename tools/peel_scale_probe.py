"""Peel-loop scale probe: coreness (capped core decomposition) and k-truss
on a >1M-vertex synthesized transcript graph.

Both operators are driver-sequenced peeling fixpoints whose per-round cost
is one |E|-bounded join+aggregate over a monotonically SHRINKING survivor
set, with eager localCheckpoint keeping each round's plan shallow (the
lineage discipline measured in BENCH/AB_NOTES.md — 428s -> 6.5s at sf0.001
before it landed). The sf0.1 bench rows (13k vertices) say nothing about
whether the loop's driver round-trips or checkpoint pressure bite at real
graph sizes; this probe is that evidence at ~1.1M vertices / ~4M edges.

Usage: python tools/peel_scale_probe.py   (env: PROBE_CONV, PROBE_CPUS,
PROBE_CORENESS_CAP, PROBE_KTRUSS_K, PROBE_SKIP_KTRUSS, PROBE_INPUT_DIR).
Writes BENCH/peel_scale_probe_<nconv>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("PROBE_CONV", "1100000"))
CPUS = int(os.environ.get("PROBE_CPUS", "32"))
CORENESS_CAP = int(os.environ.get("PROBE_CORENESS_CAP", "4"))
KTRUSS_K = int(os.environ.get("PROBE_KTRUSS_K", "3"))
SKIP_KTRUSS = os.environ.get("PROBE_SKIP_KTRUSS", "0") == "1"
INPUT_DIR = os.environ.get("PROBE_INPUT_DIR", "/tmp/scale_probe_input")


def main() -> None:
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.kcore import coreness
    from pagerank_optimization_spark.operators.triangles import ktruss
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="peel-probe", cores=CPUS, shuffle_partitions=CPUS)

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

    out: dict = {"n_conv": N_CONV, "vertices": n_v, "edges": n_e, "cpus": CPUS}

    from pyspark.sql import functions as F

    t = time.time()
    cor = coreness(vertices, edges, max_k=CORENESS_CAP, partitions=CPUS)
    hist = {int(r["coreness"]): int(r["n"]) for r in
            cor.groupBy("coreness").agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t
    out["coreness"] = {
        "max_k": CORENESS_CAP,
        "wall_s": round(wall, 2),
        "vertices_per_sec": round(n_v / wall),
        "hist": hist,
    }
    print(f"coreness cap={CORENESS_CAP}: {wall:.1f}s hist={hist}",
          file=sys.stderr, flush=True)

    if not SKIP_KTRUSS:
        t = time.time()
        n_truss = ktruss(edges, k=KTRUSS_K, partitions=CPUS).count()
        wall = time.time() - t
        out["ktruss"] = {
            "k": KTRUSS_K,
            "wall_s": round(wall, 2),
            "truss_edges": n_truss,
            "edges_per_sec": round(n_e / wall),
        }
        print(f"ktruss k={KTRUSS_K}: {wall:.1f}s edges={n_truss:,}",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", f"peel_scale_probe_{N_CONV}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
