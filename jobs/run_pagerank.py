"""spark-submit entrypoint: PageRank over a transcript table (north rule's
delivery form — ``spark-submit --py-files pagerank_optimization_spark.zip
jobs/run_pagerank.py ...``).

Examples
--------
Local smoke over driver testdata (events → transcripts derivation):

    spark-submit jobs/run_pagerank.py \
        --events /root/testdata/sf0.01/events.parquet \
        --output /tmp/pr_out --checkpoint /tmp/pr_ckpt --run-id demo

Cluster run over a real transcripts table:

    spark-submit --master yarn --py-files pagerank_optimization_spark.zip \
        jobs/run_pagerank.py --transcripts s3://bucket/transcripts/ \
        --kernel csr-blocks --tol 1e-6 --output s3://bucket/ranks/
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python jobs/run_pagerank.py` without --py-files (repo root on path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="parquet path with the transcript schema")
    src.add_argument("--events", help="events parquet to derive transcripts from")
    ap.add_argument("--output", required=True, help="output path for the rank table")
    ap.add_argument("--kernel", default="join-agg", choices=["join-agg", "csr-blocks", "auto"])
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--fixed-iters", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--checkpoint", default=None, help="checkpoint root (enables resume)")
    ap.add_argument("--warm-start", default=None,
                    help="previous run's rank parquet (entity, pr) to seed x0 — "
                         "the incremental form for an evolving graph; a "
                         "--checkpoint resume takes precedence")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--top", type=int, default=20, help="print top-N entities")
    args = ap.parse_args(argv)

    from pagerank_optimization_spark.checkpoint import CheckpointManager
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.pagerank import pagerank
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import transcripts_from_events

    spark = get_spark(app_name=f"pagerank-{args.run_id}")
    if args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    else:
        transcripts = transcripts_from_events(spark.read.parquet(args.events))

    vertices, edges = build_graph(transcripts)
    cm = (
        CheckpointManager(spark, args.checkpoint, args.run_id)
        if args.checkpoint
        else None
    )
    x0 = spark.read.parquet(args.warm_start) if args.warm_start else None
    res = pagerank(
        vertices,
        edges,
        damping=args.damping,
        tol=args.tol,
        max_iter=args.max_iter,
        fixed_iters=args.fixed_iters,
        partitions=args.partitions,
        kernel=args.kernel,
        checkpointer=cm,
        x0=x0,
    )
    res.ranks.write.mode("overwrite").parquet(args.output)
    print(
        f"pagerank: iterations={res.iterations} converged={res.converged} "
        f"last_delta={res.deltas[-1] if res.deltas else None}"
    )
    res.ranks.orderBy(F.desc("pr")).show(args.top, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
