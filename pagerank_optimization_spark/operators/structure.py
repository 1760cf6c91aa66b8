"""Structural near-duplicate detection over the link graph: exact
Jaccard similarity of neighbor sets.

Two vertices whose out- (or in-) neighbor sets are nearly identical are
structural duplicates — mirror sites in a web graph, cloned agents or
templated conversations in a transcript graph. This is the graph analog
of document n-gram Jaccard: the "shingle" is a neighbor, the "document"
is a vertex, and the same exact-pair machinery applies
(operators.dedup.ngram_jaccard_pairs — shared-element self-join,
|A∩B| count, sizes joined back for the union).

Scale notes (100 TB lens): cost is Σ_v fanin(v)² over shared neighbors —
a hub followed by n vertices would alone emit C(n,2) candidate rows, so
hot neighbors above ``max_neighbor_freq`` are dropped from the sets
first (the boilerplate-shingle guard of the dedup family; a neighbor
shared by everyone carries no similarity signal anyway, exactly like a
stopword). Everything else is distinct-set aggregation + one equi-join —
map-side-combinable, no windows, no Python. For graphs where even the
capped join is too wide, the MinHash-LSH scale path applies verbatim by
feeding (vertex, neighbor) rows through the dedup signature machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_jaccard_pairs(
    edges: DataFrame,
    *,
    threshold: float = 0.8,
    direction: str = "out",
    max_neighbor_freq: int = 1000,
    counters: dict | None = None,
) -> DataFrame:
    """→ (a, b, jaccard) with a < b and exact neighbor-set Jaccard ≥
    ``threshold``. ``direction="out"`` compares out-neighbor sets (who
    they point to), ``"in"`` compares in-neighbor sets (who points to
    them). ``counters``: optional dict to record hot-neighbor cap fires
    (one extra aggregation job; bench-only)."""
    if direction not in ("out", "in"):
        raise ValueError(f"neighbor_jaccard_pairs: unknown direction {direction!r}")
    idc, elc = ("src", "dst") if direction == "out" else ("dst", "src")
    ns = edges.select(F.col(idc).alias("id"), F.col(elc).alias("elem"))
    freq = ns.groupBy("elem").agg(F.count("*").alias("ef"))
    if counters is not None:
        row = (
            freq.filter(F.col("ef") > max_neighbor_freq)
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("ef"), F.lit(0)).alias("rows"),
            )
            .collect()[0]
        )
        counters["neighbors_capped"] = int(row["n"])
        counters["neighbor_rows_capped"] = int(row["rows"])
    ns = ns.join(
        freq.filter(F.col("ef") <= max_neighbor_freq), "elem", "left_semi"
    )
    sizes = ns.groupBy("id").agg(F.count("*").alias("n_el"))

    a = ns.select(F.col("id").alias("a"), "elem")
    b = ns.select(F.col("id").alias("b"), "elem")
    common = (
        a.join(b, "elem")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("a"), F.col("n_el").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n_el").alias("nb")), "b")
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 8).alias("jaccard"))
    )


def neighbor_minhash_pairs(
    edges: DataFrame,
    *,
    direction: str = "out",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    hasher: str = "xxhash64",
    max_bucket_size: int = 500,
    max_neighbor_freq: int | None = None,
    counters: dict | None = None,
) -> DataFrame:
    """→ (a, b, est_jaccard): the sub-quadratic scale path for structural
    near-dup — MinHash signatures over neighbor sets + banded LSH, the
    exact machinery the document dedup family uses
    (dedup.minhash_signatures_from_elements + lsh_pairs_from_signatures),
    fed (vertex, neighbor) rows instead of (doc, shingle) rows. Use when
    the exact neighbor_jaccard_pairs join is too wide even capped; same
    exact↔sketch split as ngram_jaccard ↔ minhash_lsh_pairs.

    ``max_neighbor_freq``: optionally apply the hot-neighbor cap BEFORE
    sketching (then est_jaccard estimates the capped sets — pass the same
    cap to neighbor_jaccard_pairs when comparing)."""
    from pagerank_optimization_spark.operators.dedup import (
        lsh_pairs_from_signatures,
        minhash_signatures_from_elements,
    )

    if direction not in ("out", "in"):
        raise ValueError(f"neighbor_minhash_pairs: unknown direction {direction!r}")
    idc, elc = ("src", "dst") if direction == "out" else ("dst", "src")
    ns = edges.select(F.col(idc).alias("id"), F.col(elc).alias("elem"))
    if max_neighbor_freq is not None:
        freq = ns.groupBy("elem").agg(F.count("*").alias("ef"))
        ns = ns.join(
            freq.filter(F.col("ef") <= max_neighbor_freq), "elem", "left_semi"
        )
    sigs = minhash_signatures_from_elements(
        ns, num_perm=num_perm, id_col="id", elem_col="elem",
        seed=seed, hasher=hasher,
    ).persist()
    return lsh_pairs_from_signatures(
        sigs, num_perm=num_perm, bands=bands, threshold=threshold,
        id_col="id", hasher=hasher, max_bucket_size=max_bucket_size,
        counters=counters,
    )
