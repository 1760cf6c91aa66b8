"""HyperBall scale probe: the ANF curve (hyperball_curve) on a >1M-vertex
synthesized transcript graph.

The sketch path's 100 TB claim is that per-round cost is O(|E| · m) bytes
of packed int arrays, constant in the reach being counted — but the sf0.1
bench exercises it on a 13k-vertex graph where a round is noise. This
probe runs the full curve at ~1.1M vertices / ~4M edges, where the top
undirected degree is ~71k. The probe's first run (collect_list fold
merge, merge_salt=32) measured 84 s/round and motivated the
map-side-combinable per-register-max merge (_merge_groupby) now used by
the operators: 56 s/round, identical curve, no salt stage needed — hub
fan-in collapses in the partial-agg hash table before the exchange.

Usage: python tools/reach_scale_probe.py   (env: PROBE_CONV, PROBE_CPUS,
PROBE_INPUT_DIR, PROBE_R, PROBE_P, PROBE_SALT — shares the cached graph
with the other scale probes). Writes BENCH/reach_scale_probe_<nconv>.json.
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
R = int(os.environ.get("PROBE_R", "4"))
P = int(os.environ.get("PROBE_P", "8"))
SALT = int(os.environ.get("PROBE_SALT", "0"))


def main() -> None:
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.neighborhood import (
        effective_diameter,
        hyperball_curve,
    )
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="reach-probe", cores=CPUS, shuffle_partitions=CPUS)

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

    t = time.time()
    curve = hyperball_curve(vertices, edges, R, p=P, merge_salt=SALT, partitions=CPUS)
    wall = time.time() - t

    out = {
        "n_conv": N_CONV,
        "vertices": n_v,
        "edges": n_e,
        "cpus": CPUS,
        "r": R,
        "p": P,
        "merge_salt": SALT,
        "wall_s": round(wall, 2),
        "wall_s_per_round": round(wall / R, 2),
        "edges_per_sec_per_round": round(n_e * R / wall),
        "curve": [(h, round(n, 1)) for h, n in curve],
        "effective_diameter_q90": round(effective_diameter(curve), 3),
        "avg_reach_at_r": round(curve[-1][1] / n_v, 2),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", f"reach_scale_probe_{N_CONV}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
