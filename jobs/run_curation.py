"""spark-submit entrypoint: the full training-data curation pipeline over
a documents table — the composition every operator family in
operators.{quality,dedup,sampling} exists to serve.

    spark-submit --py-files pagerank_optimization_spark.zip \
        jobs/run_curation.py --documents .../documents.parquet \
        --output /tmp/curated [--embeddings .../embeddings.parquet] \
        [--benchmark .../benchmark_docs.parquet] \
        [--sample-rate 1.0] [--pack-budget 2048] \
        [--max-top-ngram-frac 0.5] [--max-dup-line-frac 0.5] \
        [--source-cap N]

Stage ladder (each stage linear / bucketed — no all-pairs joins):

1. line dedup        quality.dedup_lines (keep-first, boilerplate cap)
2. doc dedup         dedup.dedup_cascade (exact → MinHash-LSH → semantic)
3. repetition filter quality.repetition_stats thresholds (Gopher-style)
4. decontamination   quality.contamination_flags vs --benchmark (if given);
                     --bloom-bits N switches to quality.bloom_contamination
                     (benchmark state capped at N position rows, no false
                     negatives — the accumulated-benchmarks form)
5. DSIR selection    dsir.dsir_logratios vs --dsir-target +
                     weighted_reservoir_sample of --dsir-top-n docs at
                     --dsir-temperature (Xie et al. 2023 resampling)
6. source cap        quality.source_cap keeps the N best per source
7. PII redaction     pii.redact_pii (--redact-pii; rewrites text in place)
8. sampling          sampling.hash_sample (deterministic, resumable)
9. packing           sampling.pack_documents at --pack-budget

Writes the curated docs parquet plus a .stats.json with per-stage
in/out counts and skew-cap fire counters — the numbers an operator of a
100 TB run watches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--embeddings", default=None)
    ap.add_argument("--benchmark", default=None,
                    help="benchmark docs parquet for decontamination")
    ap.add_argument("--contam-k", type=int, default=8)
    ap.add_argument("--bloom-bits", type=int, default=None,
                    help="use Bloom-filter decontamination with this many bits "
                         "(capped benchmark state, no false negatives)")
    ap.add_argument("--bloom-hashes", type=int, default=4)
    ap.add_argument("--dsir-target", default=None,
                    help="target-domain docs parquet for DSIR selection")
    ap.add_argument("--dsir-top-n", type=int, default=None,
                    help="keep this many docs by DSIR importance resampling")
    ap.add_argument("--dsir-temperature", type=float, default=1.0)
    ap.add_argument("--dsir-dim", type=int, default=4096)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--sample-salt", default="")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--max-top-ngram-frac", type=float, default=0.5)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.5)
    ap.add_argument("--max-line-freq", type=int, default=1_000_000)
    ap.add_argument("--source-cap", type=int, default=None)
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/IPs/SSNs/phones from text (counts recorded)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.dedup import dedup_cascade
    from pagerank_optimization_spark.operators.quality import (
        contamination_flags,
        dedup_lines,
        repetition_stats,
        source_cap,
    )
    from pagerank_optimization_spark.operators.sampling import (
        hash_sample,
        pack_documents,
    )
    from pagerank_optimization_spark.session import get_spark

    spark = get_spark(app_name="curation-pipeline")
    docs = spark.read.parquet(args.documents).persist()
    stages: list[dict] = []
    n = docs.count()

    def record(stage: str, out_n: int, **extra) -> None:
        nonlocal n
        stages.append({"stage": stage, "in": n, "out": out_n, **extra})
        n = out_n

    # 1. line-level dedup: replace text with the deduped reassembly and
    # drop docs whose every line was boilerplate/duplicate
    dl_caps: dict = {}
    cleaned = dedup_lines(docs, max_line_freq=args.max_line_freq, counters=dl_caps)
    docs2 = (
        docs.join(cleaned.filter(F.col("n_lines_kept") > 0), "doc_id")
        .drop("text")
        .withColumnRenamed("text_clean", "text")
        .drop("n_lines_kept", "n_lines_dropped")
        .persist()
    )
    record("line_dedup", docs2.count(), skew_caps_fired=dl_caps)
    docs.unpersist()

    # 2. document-level dedup cascade
    emb = spark.read.parquet(args.embeddings) if args.embeddings else None
    cas_caps: dict = {}
    survivors, cas_stats = dedup_cascade(docs2, embeddings=emb, counters=cas_caps)
    docs3 = docs2.join(survivors.select("doc_id"), "doc_id").persist()
    record("dedup_cascade", docs3.count(), per_stage=cas_stats,
           skew_caps_fired=cas_caps)
    docs2.unpersist()

    # 3. repetition filter (Gopher-style thresholds)
    rep = repetition_stats(docs3)
    keep = rep.filter(
        (F.col("top_ngram_frac") <= args.max_top_ngram_frac)
        & (F.col("dup_line_frac") <= args.max_dup_line_frac)
    ).select("doc_id")
    docs4 = docs3.join(keep, "doc_id").persist()
    record("repetition_filter", docs4.count())
    docs3.unpersist()

    # 4. decontamination (only with a benchmark table)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        if args.bloom_bits:
            from pagerank_optimization_spark.operators.quality import (
                bloom_contamination,
            )

            flagged = bloom_contamination(
                docs4,
                bench,
                k=args.contam_k,
                bits=args.bloom_bits,
                hashes=args.bloom_hashes,
            ).select("doc_id")
        else:
            flagged = contamination_flags(
                docs4, bench, k=args.contam_k
            ).select("doc_id")
        docs5 = docs4.join(flagged, "doc_id", "left_anti").persist()
        record("decontamination", docs5.count(),
               mode="bloom" if args.bloom_bits else "exact")
        docs4.unpersist()
    else:
        docs5 = docs4
        record("decontamination", n, skipped="no --benchmark")

    # 5. DSIR target-domain selection (only with a target + budget)
    if args.dsir_target and args.dsir_top_n:
        from pagerank_optimization_spark.operators.dsir import dsir_logratios
        from pagerank_optimization_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        target = spark.read.parquet(args.dsir_target)
        w = dsir_logratios(docs5, target, dim=args.dsir_dim).select(
            "doc_id",
            F.exp(F.col("logw_per_feat") / F.lit(args.dsir_temperature)).alias("w"),
        )
        picked = weighted_reservoir_sample(
            w, args.dsir_top_n, F.col("w"), "doc_id"
        ).select("doc_id")
        docs5b = docs5.join(picked, "doc_id").persist()
        record("dsir_select", docs5b.count(), top_n=args.dsir_top_n,
               temperature=args.dsir_temperature, dim=args.dsir_dim)
        docs5.unpersist()
        docs5 = docs5b
    else:
        record("dsir_select", n, skipped="no --dsir-target/--dsir-top-n")

    # 6. per-source cap (only if requested and the column exists)
    if args.source_cap and "source" in docs5.columns:
        capped = source_cap(docs5, args.source_cap).select("doc_id")
        docs6 = docs5.join(capped, "doc_id").persist()
        record("source_cap", docs6.count())
        docs5.unpersist()
    else:
        docs6 = docs5
        record("source_cap", n, skipped="not requested")

    # 7. PII redaction (rewrites text in place; drops nothing)
    if args.redact_pii:
        from pagerank_optimization_spark.operators.pii import PII_RULES, redact_pii

        red = redact_pii(docs6).persist()
        hit_row = red.agg(
            *[F.sum(f"n_{nm}").alias(nm) for nm, _, _ in PII_RULES]
        ).collect()[0]
        hits = {k: int(v or 0) for k, v in hit_row.asDict().items()}
        docs6r = (
            docs6.drop("text")
            .join(
                red.select("doc_id", F.col("text_redacted").alias("text")),
                "doc_id",
            )
            .persist()
        )
        record("pii_redact", docs6r.count(), matches=hits)
        red.unpersist()
    else:
        docs6r = docs6
        record("pii_redact", n, skipped="not requested")

    # 8. deterministic sampling
    if args.sample_rate < 1.0:
        docs7 = hash_sample(docs6r, args.sample_rate, "doc_id", salt=args.sample_salt)
    else:
        docs7 = docs6r
    docs7 = docs7.persist()
    record("hash_sample", docs7.count(), rate=args.sample_rate)

    # 9. sequence packing: attach bin assignment to each survivor
    packed = pack_documents(docs7, args.pack_budget)
    out = docs7.join(packed, "doc_id")
    out.write.mode("overwrite").parquet(args.output)
    n_bins = out.agg((F.max("bin_id") + 1).alias("b")).collect()[0]["b"]
    record("pack", out.count(), budget=args.pack_budget, bins=int(n_bins or 0))

    stats_path = os.path.join(
        os.path.dirname(args.output) or ".",
        os.path.basename(args.output) + ".stats.json",
    )
    with open(stats_path, "w") as f:
        json.dump({"stages": stages}, f, indent=2)
    for s in stages:
        print(f"{s['stage']:18s} in {s['in']:>9d} → out {s['out']:>9d}"
              + (f"  [skipped: {s['skipped']}]" if "skipped" in s else ""))
    print(f"stats: {stats_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
