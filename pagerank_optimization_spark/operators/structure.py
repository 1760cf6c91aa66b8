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
from pyspark.sql.window import Window


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


def adamic_adar_pairs(
    edges: DataFrame,
    *,
    min_score: float = 0.0,
    max_neighbor_freq: int = 1000,
    include_existing: bool = False,
    counters: dict | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over the undirected graph:
    AA(a, b) = Σ_{w ∈ N(a)∩N(b)} 1 / ln(deg(w)) for candidate pairs
    a < b, → (a, b, aa_score) with score ≥ ``min_score``.

    The classic "friend-of-friend" recommender (Adamic & Adar, "Friends
    and neighbors on the Web", 2003): common neighbors vote for a future
    link, each vote discounted by how promiscuous the common neighbor is
    — exactly the signal that ranks which agents/tools are about to
    interact in a transcript graph. By default pairs already connected
    by an edge are anti-joined away (prediction mode);
    ``include_existing=True`` keeps them (similarity mode).

    Scale shape (the 100 TB lens, same skeleton as
    neighbor_jaccard_pairs above): cost is Σ_w deg(w)² over common
    neighbors, so hot vertices above ``max_neighbor_freq`` are dropped
    from the candidate-generating join — principled here beyond skew
    defense, because a hub's AA vote is 1/ln(deg)→0 anyway (the operator
    discounts exactly the rows the cap removes). Everything else is
    distinct-set aggregation + one self-equi-join + a map-side-combinable
    sum; the anti-join runs on the already-thresholded pair set, never
    the candidate set. No windows, no Python.

    Degree safety: a COMMON neighbor w of a ≠ b has undirected
    deg(w) ≥ 2, so ln(deg(w)) ≥ ln 2 — no division by zero by
    construction."""
    from .components import symmetrize

    und = symmetrize(edges).filter(F.col("a") != F.col("b"))
    # (id, elem): vertex id has undirected neighbor elem
    ns = und.select(F.col("a").alias("id"), F.col("b").alias("elem"))
    freq = ns.groupBy("elem").agg(F.count("*").alias("deg"))
    if counters is not None:
        row = (
            freq.filter(F.col("deg") > max_neighbor_freq)
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("deg"), F.lit(0)).alias("rows"),
            )
            .collect()[0]
        )
        counters["neighbors_capped"] = int(row["n"])
        counters["neighbor_rows_capped"] = int(row["rows"])
    kept = ns.join(
        freq.filter(F.col("deg") <= max_neighbor_freq), "elem"
    ).select("id", "elem", "deg")

    a = kept.select(F.col("id").alias("a"), "elem", "deg")
    b = kept.select(F.col("id").alias("b"), "elem")
    scored = (
        a.join(b, "elem")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.lit(1.0) / F.log("deg")).alias("aa"))
        .filter(F.col("aa") >= min_score)
    )
    if not include_existing:
        scored = scored.join(
            und.select(F.col("a"), F.col("b")), ["a", "b"], "left_anti"
        )
    return scored.select("a", "b", F.round("aa", 8).alias("aa_score"))


def graph_stats(edges: DataFrame, *, round_to: int = 8) -> DataFrame:
    """One-row global graph profile: → (n_edges, n_loops, reciprocity,
    out_in_assortativity).

    - ``reciprocity``: fraction of non-loop directed edges (u, v) whose
      reverse (v, u) also exists (Newman et al. 2002) — in a transcript
      graph, how often interactions are two-way.
    - ``out_in_assortativity``: Pearson correlation, over edges, of
      (outdeg(src), indeg(dst)) — the directed out-in degree
      assortativity (Newman, "Assortative mixing in networks", 2002).
      Negative = hubs point at low-in-degree vertices (star-like);
      positive = rich club. Pearson r is invariant to the sample-vs-
      population variance convention (the n−1 factors cancel), so Spark
      corr() ⇄ DuckDB corr() compare exactly.

    Scale shape: two degree aggs (map-side combinable), two |V|-sized
    joins onto the edge list (AQE-gated broadcast), one left-semi
    self-join on the reversed edge for reciprocity, one global agg.
    No windows, no collect — the output is a single row."""
    e = edges.select("src", "dst")
    nonloop = e.filter(F.col("src") != F.col("dst"))
    recip = nonloop.join(
        nonloop.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("idg"))
    per_edge = e.join(outdeg, "src").join(indeg, "dst")
    counts = e.agg(
        F.count("*").alias("n_edges"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_loops"),
    )
    stats = per_edge.agg(
        F.corr(F.col("od").cast("double"), F.col("idg").cast("double")).alias("r")
    )
    nl = nonloop.agg(F.count("*").alias("n_nonloop"))
    nr = recip.agg(F.count("*").alias("n_recip"))
    return (
        counts.crossJoin(nl)
        .crossJoin(nr)
        .crossJoin(stats)
        .select(
            "n_edges",
            "n_loops",
            F.round(F.col("n_recip") / F.col("n_nonloop"), round_to).alias("reciprocity"),
            F.round(F.col("r"), round_to).alias("out_in_assortativity"),
        )
    )


def degree_histogram(edges: DataFrame, *, direction: str = "out") -> DataFrame:
    """Log2-binned degree distribution — the one-glance power-law check
    for a web-scale graph: → (bucket, degree_lo, n_vertices) where
    bucket = floor(log2(deg)) and degree_lo = 2^bucket (so bucket b
    covers degrees [2^b, 2^(b+1))).

    ``direction``: "out" (degree on src), "in" (dst), or "und"
    (symmetrized, self-loops dropped). Two map-side-combinable aggs —
    degree per vertex, then count per bucket (≤ ~64 rows out, exact
    integers, hash-exact across engines). The vertex-degree shuffle is
    the graph build's existing key; no windows, no collect."""
    if direction == "out":
        keyed = edges.select(F.col("src").alias("v"))
    elif direction == "in":
        keyed = edges.select(F.col("dst").alias("v"))
    elif direction == "und":
        from .components import symmetrize

        keyed = symmetrize(edges).filter(F.col("a") != F.col("b")).select(
            F.col("a").alias("v")
        )
    else:
        raise ValueError(f"degree_histogram: unknown direction {direction!r}")
    deg = keyed.groupBy("v").agg(F.count("*").alias("deg"))
    return (
        deg.select(F.floor(F.log2("deg")).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vertices"))
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("degree_lo"),
            "n_vertices",
        )
    )


def knn_curve(edges: DataFrame, *, round_to: int = 8) -> DataFrame:
    """Average-neighbor-degree curve k_nn(k) (Pastor-Satorras et al. 2001,
    the standard degree-correlation profile): for every out-degree k, the
    mean over vertices of out-degree k of the mean out-degree of their
    out-neighbors → (degree, avg_neighbor_outdeg, n_vertices).

    A falling curve = disassortative (hubs point at leaves — the typical
    web/transcript shape); flat = uncorrelated. Complements graph_stats'
    single-number assortativity with the full profile.

    Scale shape: one out-degree agg (map-side combinable), one |V|-sized
    degree lookup joined onto the edge list keyed by dst (dangling
    neighbors count as out-degree 0 via left join + coalesce — every
    edge contributes), a per-src mean, then a ≤max-degree-sized groupBy.
    The dst-keyed join is the PageRank gather shuffle shape; output is
    bounded by the number of distinct degrees (~hundreds at any scale)."""
    e = edges.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    nbr = (
        e.join(
            outdeg.select(F.col("src").alias("dst"), F.col("od").alias("nd")),
            "dst",
            "left",
        )
        .groupBy("src")
        .agg(F.avg(F.coalesce(F.col("nd"), F.lit(0)).cast("double")).alias("annd"))
    )
    return (
        nbr.join(outdeg, "src")
        .groupBy(F.col("od").alias("degree"))
        .agg(
            F.round(F.avg("annd"), round_to).alias("avg_neighbor_outdeg"),
            F.count("*").alias("n_vertices"),
        )
    )


def rich_club(edges: DataFrame, *, round_to: int = 8) -> DataFrame:
    """Rich-club connectivity curve φ(k) (Zhou & Mondragón 2004): over the
    simple undirected graph (canonical a<b pairs, loops dropped), for every
    observed degree value k,

        φ(k) = 2·E_>k / (N_>k · (N_>k − 1))

    where N_>k = vertices of undirected degree > k and E_>k = undirected
    edges BOTH of whose endpoints have degree > k — i.e. the edge density
    of the subgraph induced by the "rich" vertices. A rising tail means
    hubs form a tightly interlinked core (the classic web/Internet rich
    club); the transcript analog is whether high-traffic agents/tools talk
    mostly to each other. → (k, n_rich, e_rich, phi); phi is NULL when
    N_>k < 2 (undefined density).

    Scale shape: an edge counts toward E_>k exactly for k < min(deg(a),
    deg(b)), so the whole curve needs NO per-threshold scan — one degree
    agg, one |V|-sized degree lookup joined onto the undirected edge list
    (the PageRank-gather shuffle shape, AQE-broadcastable degree side),
    two ≤|distinct degrees| histograms, and one descending suffix-sum
    window over the joined histograms. Distinct undirected degrees are
    bounded by O(√|E|) (1+2+…+D ≤ 2|E|), so the single-partition window
    frame stays ≤ ~1.4M tiny rows even at 10^12 edges. min(deg a, deg b)
    is itself some endpoint's degree, so the edge histogram's key domain
    ⊆ the vertex histogram's and a left join loses nothing.

    ``und`` is referenced by deg (twice, via the union) and by emin, and
    ``deg`` by vhist and both emin joins; without a persist each
    reference re-derives the union+distinct / degree-agg shuffles from
    raw lineage (measured 84 scans / 104 exchanges / 0 reuse in the
    static plan), so both are cached — the same discipline as
    neighbor_minhash_pairs' sigs persist above."""
    from .triangles import undirected_edges

    und = undirected_edges(edges).persist()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    vhist = deg.groupBy(F.col("deg").alias("k")).agg(F.count("*").alias("nv"))
    emin = (
        und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .groupBy(F.least("da", "db").alias("k"))
        .agg(F.count("*").alias("ne"))
    )
    # suffix sums: rows strictly ABOVE the current k in the descending
    # order are exactly the degrees > k
    w = Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, -1)
    cum = vhist.join(emin, "k", "left").select(
        "k",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).cast("long").alias("n_rich"),
        F.coalesce(F.sum(F.coalesce(F.col("ne"), F.lit(0))).over(w), F.lit(0))
        .cast("long")
        .alias("e_rich"),
    )
    return cum.select(
        "k",
        "n_rich",
        "e_rich",
        F.when(
            F.col("n_rich") >= 2,
            F.round(
                F.lit(2.0)
                * F.col("e_rich")
                / (F.col("n_rich") * (F.col("n_rich") - F.lit(1))),
                round_to,
            ),
        ).alias("phi"),
    )
