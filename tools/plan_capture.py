"""Capture .explain("formatted") for the r6-touched queries.

Run once against the ROUND-5 tree (PYTHONPATH=<r5 worktree>, suffix
_before) and once against the current tree (suffix _after); output lands
in $PC_DIR (default plans/r06). For loop-based operators the capture is
the plan of ONE representative superstep/round body plus the returned
frame — the loop repeats the same shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("PC_DIR", "plans/r06")
SUFFIX = os.environ.get("PC_SUFFIX", "_after")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.session import get_spark
    from pagerank_optimization_spark.sources.transcripts import transcripts_from_events

    spark = get_spark(app_name="plan-capture", cores=8, shuffle_partitions=8)

    def cap(name, df):
        p = os.path.join(OUT, f"{name}{SUFFIX}.txt")
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(p, "w") as f:
            f.write(txt)
        print("->", p, file=sys.stderr)

    events = spark.read.parquet(f"{SF}/events.parquet")
    v, e = build_graph(transcripts_from_events(events))
    v, e = v.persist(), e.persist()
    v.count(), e.count()
    docs = spark.read.parquet(f"{SF}/documents.parquet").persist()
    docs.count()

    cap("graph_build_weighted_edges", e)

    # --- pagerank join-agg: one superstep body --------------------------
    from pagerank_optimization_spark.operators.pagerank import pagerank

    res = pagerank(v, e, fixed_iters=2, partitions=8)
    cap("pagerank_final_ranks", res.ranks)

    # --- queries with one-shot plans ------------------------------------
    from pagerank_optimization_spark.operators.triangles import (
        butterfly_count,
        triangle_count,
    )

    cap("graph_butterflies", butterfly_count(e, max_degree=1000))
    cap("triangle_count", triangle_count(e))

    from pagerank_optimization_spark.operators.centrality import harmonic_centrality

    cap("graph_harmonic_r3", harmonic_centrality(v, e, 3, partitions=8))

    from pagerank_optimization_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        substring_dup_spans,
        winnow_pairs,
    )

    cap("pipe_ngram_jaccard_pairs", ngram_jaccard_pairs(docs, k=3, threshold=0.8))
    cap("pipe_substring_spans", substring_dup_spans(docs, k=5, min_match_tokens=10))
    cap(
        "pipe_winnow_pairs",
        winnow_pairs(docs, k=12, w=10, min_shared=5, max_gram_freq=200),
    )
    cap("pipe_minhash_lsh_pairs", minhash_lsh_pairs(docs, threshold=0.5))

    from pagerank_optimization_spark.operators.salsa import salsa

    cap("graph_salsa_k5", salsa(v, e, k=2, partitions=8))

    from pagerank_optimization_spark.operators.katz import katz

    cap("graph_katz_k5", katz(v, e, k=2, partitions=8))

    from pagerank_optimization_spark.operators.betweenness import betweenness

    cap(
        "graph_betweenness_s24_d4",
        betweenness(v, e, n_sources=8, max_depth=2, partitions=8),
    )

    from pagerank_optimization_spark.operators.mis import maximal_independent_set

    cap("graph_mis", maximal_independent_set(v.limit(2000), e, partitions=8))

    from pagerank_optimization_spark.operators.triangles import ktruss

    cap("graph_ktruss3", ktruss(e, k=3, partitions=8, max_rounds=1))


if __name__ == "__main__":
    main()
