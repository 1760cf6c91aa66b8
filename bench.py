"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries on $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) under local[$SPARK_GRAFT_CPUS], mirroring the
reference's timer harness (timer_op.c): fixed k0=10 PageRank supersteps
(op_dispatch_vars.sh:31 SCALE_K=-10), throughput in edges processed per
second per superstep (the reference counts 2 FLOPs/edge/iteration,
timer_op.c:284-289 — edges/sec = GFLOP/s × 5e8).

The four kernel queries take the MIN over $BENCH_TRIALS (default 3) timed
runs — the reference's min-of-trials protocol (timer_op.c:52-61, 269);
a single-pass timing is one GC pause away from a garbage row. One-shot
pipeline queries (CC, LPA, triangles, converged PR) stay single-pass —
they are long enough to amortize and min-of-N would triple bench wall.

A size-sweep table (the S10 plot-sink analog, plotter_multi.py:16-62 —
size × kernel × edges/sec/superstep) lands in BENCH/sweep.csv when
$BENCH_SWEEP=1 (off by default to keep the per-round bench tight; the
committed BENCH/sweep.csv is refreshed whenever the kernels change).

Extra fields beyond the required {metric, value, unit, queries, sf}:
``edges_per_sec_per_superstep`` for the two kernels, graph dims, and a
``synth`` section measuring the same kernels on a larger deterministic
synthesized transcript graph (the sf tables' derived graph is small enough
that per-superstep scheduling overhead dominates; the synth graph shows
compute-bound throughput). Progress goes to stderr; stdout carries exactly
one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth_conv = int(os.environ.get("BENCH_SYNTH_CONV", "40000"))
    k0 = 10

    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.components import connected_components
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.lpa import label_propagation
    from pagerank_optimization_spark.operators.pagerank import pagerank
    from pagerank_optimization_spark.operators.triangles import triangle_count
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import (
        synthesize_transcripts,
        transcripts_from_events,
    )

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        queries[name] = round(dt, 3)
        log(f"{name}: {dt:.2f}s")
        return out

    def timed_min(name: str, fn):
        """min-of-trials (timer_op.c:52-61): first call's result is kept,
        timing is the min across trials."""
        best, out = None, None
        for t in range(trials):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            log(f"{name} trial {t}: {dt:.2f}s")
            if best is None or dt < best:
                best = dt
            if out is None:
                out = r
        queries[name] = round(best, 3)
        log(f"{name}: min {best:.2f}s over {trials}")
        return out

    # --- sf-table graph -----------------------------------------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0_all = time.monotonic()

    def _build():
        v, e = build_graph(transcripts_from_events(events))
        v, e = v.persist(), e.persist()
        return v, e, v.count(), e.count()

    vertices, edges, n_v, n_e = timed("graph_build", _build)
    extra["graph"] = {"vertices": n_v, "edges": n_e}

    # one unmeasured warm-up (JIT + python worker pool) before the timed kernels
    pagerank(vertices, edges, fixed_iters=2, partitions=cpus, kernel="csr-blocks")
    res_ja = timed_min("pagerank_k10_joinagg", lambda: pagerank(vertices, edges, fixed_iters=k0, partitions=cpus))
    queries_sec = queries["pagerank_k10_joinagg"]
    extra["edges_per_sec_per_superstep_joinagg"] = round(n_e * k0 / queries_sec)

    timed_min("pagerank_k10_csr", lambda: pagerank(vertices, edges, fixed_iters=k0, partitions=cpus, kernel="csr-blocks"))
    extra["edges_per_sec_per_superstep_csr"] = round(n_e * k0 / queries["pagerank_k10_csr"])

    res_conv = timed("pagerank_converged", lambda: pagerank(vertices, edges, tol=1e-6, max_iter=100, partitions=cpus))
    extra["iterations_to_1e-6"] = res_conv.iterations

    timed("connected_components", lambda: connected_components(vertices, edges, partitions=cpus).count())
    timed("label_propagation_r5", lambda: label_propagation(vertices, edges, rounds=5, partitions=cpus).count())
    timed("triangle_count", lambda: triangle_count(edges).collect())

    # --- synthesized large graph (compute-bound regime) ---------------------
    def _synth():
        tr = synthesize_transcripts(spark, synth_conv, seed=42)
        v, e = build_graph(tr)
        v, e = v.persist(), e.persist()
        return v, e, v.count(), e.count()

    sv, se, s_nv, s_ne = timed("synth_graph_build", _synth)
    extra["synth_graph"] = {"n_conv": synth_conv, "vertices": s_nv, "edges": s_ne}
    timed_min("synth_pagerank_k10_joinagg", lambda: pagerank(sv, se, fixed_iters=k0, partitions=cpus))
    extra["synth_edges_per_sec_per_superstep_joinagg"] = round(s_ne * k0 / queries["synth_pagerank_k10_joinagg"])
    timed_min("synth_pagerank_k10_csr", lambda: pagerank(sv, se, fixed_iters=k0, partitions=cpus, kernel="csr-blocks"))
    extra["synth_edges_per_sec_per_superstep_csr"] = round(s_ne * k0 / queries["synth_pagerank_k10_csr"])

    # --- size sweep (S10 plot-sink analog) -----------------------------------
    if os.environ.get("BENCH_SWEEP", "0") == "1":
        import csv

        rows = []
        for n_conv in (5000, 20000, synth_conv):
            tr = synthesize_transcripts(spark, n_conv, seed=42)
            wv, we = build_graph(tr)
            wv, we = wv.persist(), we.persist()
            w_nv, w_ne = wv.count(), we.count()
            for kern in ("join-agg", "csr-blocks"):
                best = None
                for _ in range(trials):
                    t0 = time.monotonic()
                    pagerank(wv, we, fixed_iters=k0, partitions=cpus, kernel=kern)
                    dt = time.monotonic() - t0
                    best = dt if best is None or dt < best else best
                rows.append(
                    {
                        "n_conv": n_conv,
                        "vertices": w_nv,
                        "edges": w_ne,
                        "kernel": kern,
                        "k0": k0,
                        "wall_s_min": round(best, 3),
                        "edges_per_sec_per_superstep": round(w_ne * k0 / best),
                    }
                )
                log(f"sweep n_conv={n_conv} {kern}: {best:.2f}s")
            wv.unpersist(), we.unpersist()
        # large-m Kronecker row: the O(nnz) R-MAT sampler feeding both
        # kernels — m=16384 is 64x past the exact sweep's practical cutoff
        # (m^2 = 268M cells vs ~2M sampled balls)
        from pagerank_optimization_spark.sources.kronecker import kronecker_graph

        km = 16384
        kv, ke = kronecker_graph(spark, km, seed=42, method="rmat")
        kv, ke = kv.persist(), ke.persist()
        k_nv, k_ne = kv.count(), ke.count()
        for kern in ("join-agg", "csr-blocks"):
            best = None
            for _ in range(trials):
                t0 = time.monotonic()
                pagerank(kv, ke, id_col="vid", fixed_iters=k0, partitions=cpus, kernel=kern)
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            rows.append(
                {
                    "n_conv": f"kron_rmat_m{km}",
                    "vertices": k_nv,
                    "edges": k_ne,
                    "kernel": kern,
                    "k0": k0,
                    "wall_s_min": round(best, 3),
                    "edges_per_sec_per_superstep": round(k_ne * k0 / best),
                }
            )
            log(f"sweep kron_rmat m={km} {kern}: {best:.2f}s")
        kv.unpersist(), ke.unpersist()

        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/sweep.csv", "w", newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            wtr.writeheader()
            wtr.writerows(rows)
        extra["sweep"] = rows

        # hub-skew row: one SOURCE owns 40% of all edges — co-partitioned
        # by hash(src), its whole edge list lands in ONE join task every
        # superstep. hub_split_degree="auto" (out-degree probe + salted
        # edge split, plans.partitioning) spreads it. The decisive metric
        # at cluster scale is the PARTITION BALANCE (max task's edge share
        # bounds the parallel speedup of every superstep); local wall
        # times are reported too, but a 200k-row task is sub-second on one
        # JVM, so the local walls sit at the scheduling floor either way.
        # (dst-side hubs need no defense — map-side partial aggregation
        # already combines them; measured and documented in
        # plans.partitioning.)
        from pagerank_optimization_spark.plans.partitioning import with_src_degree_salt

        hv = spark.range(600_000).selectExpr("concat('v', id) AS entity")
        he = spark.range(500_000).selectExpr(
            "CASE WHEN id % 10 < 4 THEN 'v0' ELSE concat('v', id) END AS src",
            "concat('v', (id * 37) % 600000) AS dst",
            "1.0 AS weight",
        ).persist()
        he.count()

        def balance(df, *keys):
            parts = (
                df.repartition(cpus, *keys)
                .select(F.spark_partition_id().alias("p"))
                .groupBy("p").count().collect()
            )
            counts = [r["count"] for r in parts]
            return round(max(counts) * len(counts) / sum(counts), 2)

        hub_row = {"max_task_skew_split_off": balance(he, "src")}
        salted, _hubs = with_src_degree_salt(he, max_deg=10_000)
        hub_row["max_task_skew_split_auto"] = balance(salted, "src", "ssalt")
        for mode, split in (("off", None), ("auto", "auto")):
            best = None
            for _ in range(trials):
                t0 = time.monotonic()
                pagerank(hv, he, fixed_iters=5, partitions=cpus, hub_split_degree=split)
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            hub_row[f"wall_s_min_split_{mode}"] = round(best, 3)
            log(f"hub-skew split={mode}: {best:.2f}s")
        he.unpersist()
        log(f"hub-skew max-task/mean: off={hub_row['max_task_skew_split_off']}x "
            f"auto={hub_row['max_task_skew_split_auto']}x")
        extra["hub_skew_500k_edges_k5"] = hub_row

    total = time.monotonic() - t0_all
    out = {
        "metric": "total wall seconds, headline link-graph suite (PageRank k10 both kernels, converged PageRank, CC, LPA, triangles) on transcript graph derived from events",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        **extra,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
