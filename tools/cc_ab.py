"""Connected-components defense A/B (r4 VERDICT Next #2): the r4 bench
wall for `connected_components` regressed 4.53→7.88s (+74%) on the sf0.1
events graph — the one query whose code changed that round — while the
builder's warm A/B put the defense cost at ~7% post-gate. This tool
settles it IN PROTOCOL: the bench's exact CC row (same graph build, same
partitions, same count() action) with defenses ON (hub_split="auto" +
hot-label salting, the bench default) vs OFF (hub_split=None,
shortcut_salt_members=None), INTERLEAVED min-of-N trials in one warm JVM
(bench.py's protocol), so ambient drift hits both arms.

Usage: python tools/cc_ab.py    (env: CC_AB_TRIALS=3, SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS) — prints one JSON line and writes BENCH/cc_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pagerank_optimization_spark.operators.components import connected_components
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import transcripts_from_events

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("CC_AB_TRIALS", "3"))

    spark = get_spark(app_name="cc-ab", cores=cpus, shuffle_partitions=cpus)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    vertices, edges = build_graph(transcripts_from_events(events))
    vertices, edges = vertices.persist(), edges.persist()
    n_v, n_e = vertices.count(), edges.count()

    arms = {
        "defenses_on": dict(hub_split="auto"),  # bench defaults (salt bound gated)
        "defenses_off": dict(hub_split=None, shortcut_salt_members=None),
    }
    # unmeasured warmup (JIT + shuffle machinery), one run per arm
    for kw in arms.values():
        connected_components(vertices, edges, partitions=cpus, **kw).count()

    walls: dict[str, list[float]] = {k: [] for k in arms}
    for t in range(trials):
        for name, kw in arms.items():  # interleaved: drift hits both arms
            t0 = time.monotonic()
            connected_components(vertices, edges, partitions=cpus, **kw).count()
            dt = time.monotonic() - t0
            walls[name].append(round(dt, 3))
            print(f"trial {t} {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    mins = {k: min(v) for k, v in walls.items()}
    out = {
        "graph": {"vertices": n_v, "edges": n_e, "sf_dir": sf_dir, "cpus": cpus},
        "trials": trials,
        "walls_s": walls,
        "min_s": mins,
        "on_over_off_ratio": round(mins["defenses_on"] / mins["defenses_off"], 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cc_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
