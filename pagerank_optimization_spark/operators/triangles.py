"""Triangle counting — north_star algorithm #4 (absent from the reference;
built on the same edge DataFrame).

Algorithm: canonicalize to undirected edges (a < b, self-loops dropped),
then count 2-paths that close — two self-joins. For power-law graphs the
classic optimization is to orient edges from lower- to higher-degree
endpoint before the 2-path join, which bounds per-vertex join fan-out by
O(sqrt(|E|)) (hub vertices stop being 2-path centers) — the degree
orientation is the default and the 100 TB-scale path for BOTH the global
count and the per-vertex counts; the lexicographic orientation is kept
because it is oracle-expressible in portable SQL
(``triangle_count(degree_oriented=False)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vid_und(und: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Map a canonical undirected edge set (a, b) into dense integer vid
    space (r6, guide §2.3 "narrower types"): the triangle/butterfly/truss
    pair tables are O(Σ deg²) rows and their exchanges carry the vertex
    pair on every row — 16 bytes of vids instead of two entity strings.
    ``vertex_ids`` assigns vid = rank of entity in global sorted order, so
    the mapping is ORDER-PRESERVING: a < b ⟺ vid(a) < vid(b), and both the
    lexicographic and the degree orientation (ties by entity) survive the
    translation bit-for-bit. → (edges(a, b) as longs with a < b, ids)."""
    from pagerank_optimization_spark.operators.graph_build import vertex_ids

    verts = (
        und.select(F.col("a").alias("entity"))
        .unionAll(und.select(F.col("b").alias("entity")))
        .distinct()
    )
    ids = vertex_ids(verts)
    ia = ids.select(F.col("entity").alias("a"), F.col("vid").alias("ia"))
    ib = ids.select(F.col("entity").alias("b"), F.col("vid").alias("ib"))
    und_i = (
        und.join(ia, "a").join(ib, "b")
        .select(F.col("ia").alias("a"), F.col("ib").alias("b"))
    )
    return und_i, ids


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a < b, self-loops dropped,
    duplicates collapsed."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def degree_oriented_edges(und: DataFrame) -> DataFrame:
    """Orient each undirected edge low-degree → high-degree endpoint (ties
    by entity): an acyclic total-order orientation under which no vertex's
    out-set exceeds O(sqrt(|E|)) — the 2-path fan-out bound that keeps hub
    vertices from generating O(deg²) join rows. → (x, y) oriented pairs."""
    deg = (
        und.select(F.col("a").alias("v")).unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count("*").alias("deg"))
    )
    # deg is |V|-sized and unbounded — no broadcast hint; AQE picks
    # broadcast iff the measured size fits autoBroadcastJoinThreshold
    return (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
            )
            .otherwise(F.struct(F.col("b").alias("x"), F.col("a").alias("y")))
            .alias("e")
        )
        .select("e.x", "e.y")
    )


def _oriented_from_und(und: DataFrame, *, degree_oriented: bool = True) -> DataFrame:
    """→ (v0, v1, v2) triangles of a canonical undirected edge set (a, b)
    with a < b — each EXACTLY ONCE as the unique 2-path v0→v1→v2 plus
    closing edge v0→v2 under an acyclic orientation (an acyclically
    oriented 3-cycle has exactly one length-2 directed path). Key-type
    agnostic: runs on entity strings or vids alike."""
    if degree_oriented:
        e = degree_oriented_edges(und)
    else:
        e = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    p1 = e.select(F.col("x").alias("v0"), F.col("y").alias("v1"))
    p2 = e.select(F.col("x").alias("v1"), F.col("y").alias("v2"))
    two_paths = p1.join(p2, "v1")
    closing = e.select(F.col("x").alias("v0"), F.col("y").alias("v2"))
    return two_paths.join(closing, ["v0", "v2"], "inner").select("v0", "v1", "v2")


def _oriented_triangles(edges: DataFrame, *, degree_oriented: bool = True) -> DataFrame:
    """→ (v0, v1, v2) triangles over entity keys. (r6 note: a vid-space
    variant was measured SLOWER here at sf0.1 — the degree orientation
    already bounds the 2-path fan-out, so the id-map build cost exceeded
    the exchange-byte savings; ktruss amortizes one map over many peel
    rounds and butterflies over an O(Σ deg²) wedge table, so those run in
    vid space while the one-shot triangle pass stays on strings.)"""
    return _oriented_from_und(undirected_edges(edges), degree_oriented=degree_oriented)


def triangle_count(edges: DataFrame, *, degree_oriented: bool = True) -> DataFrame:
    """→ 1-row DataFrame(n_triangles long): global triangle count."""
    tri = _oriented_triangles(edges, degree_oriented=degree_oriented)
    return tri.agg(F.count("*").alias("n_triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected view:
    → (entity, degree, n_tri, coeff) with
    coeff = 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, else 0.
    Defined over vertices with ≥1 undirected edge (isolated vertices have
    no neighborhood to measure). SQL-expressible → DuckDB-oracle-checked
    (plans.oracle_sql.clustering_query_sql)."""
    und = undirected_edges(edges)
    deg = (
        und.select(F.col("a").alias("entity"))
        .unionByName(und.select(F.col("b").alias("entity")))
        .groupBy("entity")
        .agg(F.count("*").alias("degree"))
    )
    tri = local_triangle_counts(edges)
    return (
        deg.join(tri.withColumnRenamed("n_triangles", "n_tri"), "entity", "left")
        .select(
            "entity",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.lit(2.0)
                    * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1.0))),
                ).otherwise(F.lit(0.0)),
                8,
            ).alias("coeff"),
        )
    )


def local_triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts (entity, n_triangles) —
    clustering-coefficient building block.

    Counts on the DEGREE-ORIENTED edge set: each triangle is found once
    as its unique oriented 2-path + closing edge, then attributed to all
    three corners (v0, v1, v2). The 2-path fan-out is bounded by the
    orientation's O(sqrt(|E|)) out-degree — a hub as 2-path center under
    the old lexicographic orientation generated O(deg²) join rows, fine
    at sf0.01 and a scale hazard on power-law graphs at 100×."""
    tri = _oriented_triangles(edges, degree_oriented=True)
    return (
        tri.select(F.col("v0").alias("entity"))
        .unionByName(tri.select(F.col("v1").alias("entity")))
        .unionByName(tri.select(F.col("v2").alias("entity")))
        .groupBy("entity")
        .agg(F.count("*").alias("n_triangles"))
    )


def _edge_support(cur: DataFrame, *, degree_oriented: bool = True) -> DataFrame:
    """Per-edge triangle support over a canonical undirected edge set
    ``cur(a, b)`` with a < b: → (a, b, sup). Each triangle is enumerated
    once under an acyclic orientation and attributed to its three edges
    (re-canonicalized least/greatest — the orientation changes the plan,
    never the triangle set)."""
    if degree_oriented:
        e = degree_oriented_edges(cur)
    else:
        e = cur.select(F.col("a").alias("x"), F.col("b").alias("y"))
    p1 = e.select(F.col("x").alias("v0"), F.col("y").alias("v1"))
    p2 = e.select(F.col("x").alias("v1"), F.col("y").alias("v2"))
    closing = e.select(F.col("x").alias("v0"), F.col("y").alias("v2"))
    tri = p1.join(p2, "v1").join(closing, ["v0", "v2"], "inner")
    sides = (
        tri.select(F.col("v0").alias("p"), F.col("v1").alias("q"))
        .unionByName(tri.select(F.col("v1").alias("p"), F.col("v2").alias("q")))
        .unionByName(tri.select(F.col("v0").alias("p"), F.col("v2").alias("q")))
    )
    return (
        sides.select(F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("sup"))
    )


def ktruss(
    edges: DataFrame,
    *,
    k: int = 4,
    max_rounds: int = 50,
    partitions: int | None = None,
    degree_oriented: bool = True,
) -> DataFrame:
    """k-truss — the maximal subgraph in which every edge participates in
    ≥ k−2 triangles WITHIN the subgraph (Cohen 2008): → DataFrame(a, b),
    the canonical undirected edges of the truss (exact peeling fixpoint).

    The truss is the edge-cohesion analog of the k-core's vertex
    cohesion: dense conversational cliques survive, tree-like reply
    chains and star hubs do not — the community-core extractor of the
    engine's graph family.

    Peeling: per round, recompute per-edge triangle support on the
    SURVIVING edge set (``_edge_support`` — degree-oriented enumeration,
    2-path fan-out bounded O(sqrt|E|), the triangle_count skew defense
    applied per round since supports must be recomputed as removals
    cascade), drop edges with support < k−2, stop when a round removes
    nothing. The survivor set only shrinks, so per-round shuffle volume
    is monotonically non-increasing (the kcore discipline); one scalar
    collect per round. ``degree_oriented=False`` keeps the lexicographic
    orientation the portable-SQL oracle expresses — identical output,
    different plan."""
    if k < 3:
        raise ValueError(f"ktruss: k must be ≥ 3, got {k}")
    spark = edges.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    # r6: the whole peel runs in integer vid space (order-preserving map,
    # _vid_und) — every per-round support exchange carries 16-byte pairs
    # instead of entity strings — and the loop width is scale-adaptive
    # (effective_partitions): the caller's value caps, |E| decides.
    # eager localCheckpoint per round, NOT persist: the per-round plan
    # references cur twice (directly and through the support aggregate) and
    # nests every prior round's lineage — without truncation Catalyst
    # re-analysis compounds per round (measured: 428s for a 550-edge graph
    # at sf0.001; 6s with the checkpoint). Same discipline as components.py.
    from pagerank_optimization_spark.plans.partitioning import effective_partitions
    from pagerank_optimization_spark.session import iterative_conf

    und_i, ids = _vid_und(undirected_edges(edges))
    cur = und_i.localCheckpoint(eager=True)
    n_cur = cur.count()
    partitions = effective_partitions(partitions, n_cur)
    cur = cur.repartition(partitions, "a", "b").localCheckpoint(eager=True)

    with iterative_conf(spark, shuffle_partitions=partitions):
        for _ in range(max_rounds):
            sup = _edge_support(cur, degree_oriented=degree_oriented)
            # inner join: an edge with NO support row has 0 triangles and
            # cannot satisfy sup ≥ k−2 ≥ 1 — it drops with the join
            nxt = (
                cur.join(sup.filter(F.col("sup") >= k - 2), ["a", "b"], "inner")
                .select("a", "b")
                .repartition(partitions, "a", "b")
                .localCheckpoint(eager=True)
            )
            n_nxt = nxt.count()
            stable = n_nxt == n_cur
            cur, n_cur = nxt, n_nxt
            if stable or n_cur == 0:
                break
    # one map back to entities at the end (vid order ≡ entity order, so the
    # canonical a < b invariant survives the translation)
    ia = ids.select(F.col("vid").alias("a"), F.col("entity").alias("ea"))
    ib = ids.select(F.col("vid").alias("b"), F.col("entity").alias("eb"))
    return (
        cur.join(ia, "a").join(ib, "b")
        .select(F.col("ea").alias("a"), F.col("eb").alias("b"))
    )


def butterfly_count(
    edges: DataFrame,
    *,
    max_degree: int | None = 1000,
    counters: dict | None = None,
) -> DataFrame:
    """Global 4-cycle ("butterfly") count over the simple undirected graph
    — the cohesion motif one tier above triangles (ESCAPE, Pinar et al.
    2017; butterfly counting, Wang et al. 2019). In a link graph a
    butterfly u–a–w–b–u is two entities co-endorsed by the same two
    neighbors (co-citation cohesion); triangle-free bipartite-ish regions
    (user↔tool interactions) have NO triangles, so this is the motif that
    measures their clustering.

    Identity (no per-cycle enumeration): every 4-cycle is determined by an
    unordered diagonal pair {u, w} plus 2 of their codeg(u,w) common
    neighbors, and has exactly 2 diagonals, so

        C4 = Σ_{u<w} C(codeg(u,w), 2) / 2  =  Σ m·(m−1) / 4.

    One wedge pass (Σ_c C(deg c, 2) rows) + one pair agg — no 4-way join.

    ``max_degree``: the wedge pass is quadratic in center degree, so
    vertices of undirected degree > max_degree are excluded from the GRAPH
    before counting (None = exact on the full graph). This is a graph
    restriction, not a per-stage cap: the result is the EXACT butterfly
    count of the hub-filtered subgraph, so the Σ/4 identity stays integral
    and the DuckDB twin reproduces it verbatim. The framing matches the
    boilerplate-shingle cap (dedup.py): a mega-hub's O(deg²) wedge fan-out
    is the skew hazard, and at transcript scale the mega-hubs are the
    global tool entities whose 4-cycles measure only their own ubiquity.

    ``counters``: pass a dict to record hub_vertices_dropped /
    hub_edges_dropped (two extra small agg jobs; bench-only).

    → 1-row DataFrame(n_butterflies long, n_codeg2_pairs long) —
    n_codeg2_pairs = unordered vertex pairs with ≥ 2 common neighbors
    (the diagonal support set, a cohesion stat in its own right)."""
    # r6: the wedge table is Σ_c C(deg c, 2) rows (96.7M unfiltered at
    # sf0.1) and its exchange is the entire cost of this operator — so (1)
    # vertices map to integer vids first (16-byte pairs instead of two
    # entity strings on every wedge row, _vid_und), and (2) wedges are
    # generated from a per-center sorted adjacency ARRAY (one collect_list
    # shuffle of 2|E| rows) by pure codegen explosion, instead of the old
    # two-sided self-join that shuffled the neighbor table twice. The pair
    # aggregation is map-side combinable, so duplicated (u, w) wedges
    # collapse before the one remaining exchange.
    und_s = undirected_edges(edges)
    if max_degree is not None:
        # persist: deg derives from und (2 refs via the union) and kept
        # re-reads und after the anti-joins — the rich_club lesson
        und_s = und_s.persist()
    und, ids = _vid_und(und_s)
    if max_degree is not None:
        und = und.localCheckpoint(eager=True)  # read by deg (2×) and kept
        deg = (
            und.select(F.col("a").alias("v"))
            .unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        hubs = deg.filter(F.col("deg") > max_degree).select("v").persist()
        kept = und.join(
            hubs.withColumnRenamed("v", "a"), "a", "left_anti"
        ).join(hubs.withColumnRenamed("v", "b"), "b", "left_anti")
        if counters is not None:
            counters["hub_vertices_dropped"] = hubs.count()
            counters["hub_edges_dropped"] = und.count() - kept.count()
    else:
        kept = und.localCheckpoint(eager=True)  # nbrs reads it twice
    nbrs = kept.select(F.col("a").alias("c"), F.col("b").alias("n")).unionAll(
        kept.select(F.col("b").alias("c"), F.col("a").alias("n"))
    )
    adj = nbrs.groupBy("c").agg(F.sort_array(F.collect_list("n")).alias("ns"))
    # all u < w pairs from the sorted array, no shuffle: (i, u) posexploded,
    # w exploded from the strictly-after slice
    pairs = (
        adj.select(F.posexplode("ns").alias("i", "u"), "ns")
        .select(
            "u",
            F.explode(
                F.slice("ns", F.col("i") + 2, F.greatest(F.size("ns") - F.col("i") - 1, F.lit(0)))
            ).alias("w"),
        )
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("m"))
    )
    return pairs.agg(
        F.coalesce(
            F.expr("sum(m * (m - 1)) div 4"), F.lit(0).cast("long")
        ).alias("n_butterflies"),
        F.coalesce(
            F.sum(F.when(F.col("m") >= 2, 1).cast("long")), F.lit(0).cast("long")
        ).alias("n_codeg2_pairs"),
    )
