"""spark-submit entrypoint: corpus dedup report over a documents table.

    spark-submit jobs/run_dedup.py --documents .../documents.parquet \
        --output /tmp/dedup_out [--method exact|ngram|minhash|simhash]
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
    ap.add_argument("--method", default="minhash", choices=["exact", "ngram", "minhash", "simhash"])
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args(argv)

    from pagerank_optimization_spark.operators import dedup
    from pagerank_optimization_spark.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.method}")
    docs = spark.read.parquet(args.documents)
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
