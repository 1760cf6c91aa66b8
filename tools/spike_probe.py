"""Quiet-window re-check of the rows that spiked in the r5-final bench run.

Same protocol as bench.py (min-of-trials, csr_cold, persisted graph,
one unmeasured warm-up) but only the three spiked queries, min-of-3 each.
"""
import json
import os
import sys
import time

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.lpa import label_propagation
from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.operators.pagerank_csr import clear_compile_cache
from pagerank_optimization_spark.operators.triangles import triangle_count
from pagerank_optimization_spark.session import get_spark
from pagerank_optimization_spark.sources.transcripts import transcripts_from_events

spark = get_spark(app_name="spike_probe", cores=cpus, shuffle_partitions=cpus)
events = spark.read.parquet(f"{sf_dir}/events.parquet")
vertices, edges = build_graph(transcripts_from_events(events))
vertices, edges = vertices.persist(), edges.persist()
vertices.count(), edges.count()

# warm-up (JIT + python worker pool), as bench.py does
pagerank(vertices, edges, fixed_iters=2, partitions=cpus, kernel="csr-blocks")

out = {}
for name, fn in [
    ("pagerank_k10_csr", lambda: (clear_compile_cache(), pagerank(vertices, edges, fixed_iters=10, partitions=cpus, kernel="csr-blocks"))),
    ("label_propagation_r5", lambda: label_propagation(vertices, edges, rounds=5, partitions=cpus).count()),
    ("triangle_count", lambda: triangle_count(edges).collect()),
]:
    walls = []
    for t in range(3):
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 3))
        print(f"{name} trial {t}: {walls[-1]}s", file=sys.stderr, flush=True)
    out[name] = {"min": min(walls), "trials": walls}

print(json.dumps(out))
