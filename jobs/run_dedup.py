"""spark-submit entrypoint: corpus dedup report over a documents table.

    spark-submit jobs/run_dedup.py --documents .../documents.parquet \
        --output /tmp/dedup_out [--method exact|ngram|minhash|simhash|cascade]
        [--embeddings .../embeddings.parquet]   # semantic tier of the cascade

``--method cascade`` runs the standard curation ladder (exact →
MinHash-LSH → optional semantic) and writes the SURVIVORS table plus a
per-stage removal report (stats.json next to the parquet output).
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python jobs/run_dedup.py` without --py-files (repo root on path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="minhash",
                    choices=["exact", "ngram", "minhash", "simhash", "cascade"])
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet for the cascade's semantic tier")
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args(argv)

    from pagerank_optimization_spark.operators import dedup
    from pagerank_optimization_spark.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.method}")
    docs = spark.read.parquet(args.documents)
    if args.method == "cascade":
        import json

        emb = spark.read.parquet(args.embeddings) if args.embeddings else None
        caps: dict = {}
        survivors, stats = dedup.dedup_cascade(docs, embeddings=emb, counters=caps)
        survivors.write.mode("overwrite").parquet(args.output)
        with open(os.path.join(os.path.dirname(args.output) or ".",
                               os.path.basename(args.output) + ".stats.json"), "w") as f:
            json.dump({"stages": stats, "skew_caps_fired": caps}, f, indent=2)
        for s in stats:
            print(f"{s['stage']:12s} removed {s['removed']:>8d}  survivors {s['survivors']:>8d}")
        if caps:
            print(f"skew caps fired: {caps}")
        return 0
    if args.method == "exact":
        out = dedup.exact_dedup(docs)
    elif args.method == "ngram":
        out = dedup.ngram_jaccard_pairs(docs, threshold=args.threshold)
    elif args.method == "minhash":
        out = dedup.minhash_lsh_pairs(docs, threshold=args.threshold)
    else:
        out = dedup.simhash_pairs(docs)
    out.write.mode("overwrite").parquet(args.output)
    print(f"{args.method}: {spark.read.parquet(args.output).count()} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
