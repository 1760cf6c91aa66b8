"""Structure-profile scale probe: rich_club / knn_curve / degree_histogram /
graph_stats on a >1M-vertex synthesized transcript graph.

The sf0.1 bench rows exercise these on a 13k-vertex graph where the
suffix-sum window, the degree-lookup joins, and the global agg are all
noise-level; this probe is the evidence that the whole structure family
stays a few-shuffle linear pass at ~1.1M vertices / ~4M edges — and that
rich_club's single-partition window frame (bounded by the number of
DISTINCT degrees, O(sqrt(|E|))) is actually tiny at this scale.

Usage: python tools/structure_scale_probe.py   (env: PROBE_CONV,
PROBE_CPUS, PROBE_INPUT_DIR — shares the cached graph with
peel_scale_probe.py). Writes BENCH/structure_scale_probe_<nconv>.json.
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


def main() -> None:
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.structure import (
        degree_histogram,
        graph_stats,
        knn_curve,
        rich_club,
    )
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="structure-probe", cores=CPUS, shuffle_partitions=CPUS)

    meta_path = f"{INPUT_DIR}/meta.json"
    if not (os.path.exists(meta_path) and json.load(open(meta_path)).get("n_conv") == N_CONV):
        print(f"preparing {N_CONV:,}-conv graph ...", file=sys.stderr, flush=True)
        v, e = build_graph(synthesize_transcripts(spark, N_CONV, seed=42))
        v.write.mode("overwrite").parquet(f"{INPUT_DIR}/vertices.parquet")
        e.write.mode("overwrite").parquet(f"{INPUT_DIR}/edges.parquet")
        json.dump({"n_conv": N_CONV}, open(meta_path, "w"))

    edges = spark.read.parquet(f"{INPUT_DIR}/edges.parquet").persist()
    n_e = edges.count()
    print(f"graph: |E|={n_e:,}", file=sys.stderr, flush=True)

    out: dict = {"n_conv": N_CONV, "edges": n_e, "cpus": CPUS}

    t = time.time()
    rc = rich_club(edges).collect()
    wall = time.time() - t
    top = max((r for r in rc if r["phi"] is not None), key=lambda r: r["k"])
    out["rich_club"] = {
        "wall_s": round(wall, 2),
        "edges_per_sec": round(n_e / wall),
        "curve_rows": len(rc),
        "top_defined_k": int(top["k"]),
        "top_phi": float(top["phi"]),
    }
    print(f"rich_club: {wall:.1f}s rows={len(rc)}", file=sys.stderr, flush=True)

    t = time.time()
    n_knn = knn_curve(edges).count()
    out["knn_curve"] = {"wall_s": round(time.time() - t, 2), "rows": n_knn}

    t = time.time()
    n_hist = degree_histogram(edges, direction="und").count()
    out["degree_histogram_und"] = {"wall_s": round(time.time() - t, 2), "rows": n_hist}

    t = time.time()
    gs = graph_stats(edges).collect()[0]
    out["graph_stats"] = {
        "wall_s": round(time.time() - t, 2),
        "reciprocity": float(gs["reciprocity"]),
        "out_in_assortativity": float(gs["out_in_assortativity"]),
    }

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", f"structure_scale_probe_{N_CONV}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
