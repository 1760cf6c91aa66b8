"""Deterministic hash-seeded random walks over the directed link graph —
the DeepWalk/node2vec corpus-generation primitive (Perozzi et al. 2014:
walk sequences feed skip-gram embedding training; at 100 TB the walk
corpus IS a training-data table, so the engine generates it as one).

Determinism contract: the neighbor chosen at step t of walk w is
``nbrs_sorted[ H48(salt:w:t) mod outdeg(cur) ]`` where H48 is the first
12 hex digits of MD5 — the same engine-portable construction as
``sampling._sample_bucket``. Walks are therefore reproducible across
runs, engines, and partitionings (no ``rand()``, whose draw order is
partitioning-dependent), nested re-runs regenerate the identical corpus,
and an unrolled DuckDB twin checks every step of every walk
(plans.oracle_sql.walks_query_sql).

Walk semantics: ``walks_per_vertex`` walks start at every vertex
(walk_id = entity + '#' + j); a walk TERMINATES when it reaches a
dangling vertex (no out-edges) — rows simply stop, mirroring the
original DeepWalk treatment of sinks on directed graphs.

Scale notes (100 TB lens):
- Each step is ONE equi-join of the walk frontier against the adjacency
  table — the same shuffle shape as a PageRank superstep gather, linear
  in |walks| per step, L steps total. No collect, no driver loop over
  walks.
- ``layout="array"`` (default) groups each vertex's sorted neighbor list
  into one adjacency row (built once, persisted, reused by all steps);
  the per-step join is 1:1 walk→row plus an O(1) element_at. Row size is
  bounded by max out-degree — right for power-law graphs short of
  super-hubs.
- ``layout="expand"`` keeps edges flat and joins on
  (cur = src AND rnk = H mod deg): never materializes an adjacency row;
  the join expands each walk to deg(cur) candidate edges before the rank
  filter — an SpMV-gather-shaped stage, the fallback when max degree
  breaks array-row limits. (Both layouts rank neighbors with one
  per-src pass; a 10^8-degree super-hub would additionally want the
  salted two-phase ranking of quality.source_cap.)
- Identical output from both layouts is part of the test contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _hash48(key: Column) -> Column:
    """First 48 bits of MD5(key) as a nonnegative long — portable
    (F.conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT)); same family
    as sampling._sample_bucket, without the 1e6 bucket modulus."""
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")


def random_walks(
    vertices: DataFrame,
    edges: DataFrame,
    length: int,
    *,
    walks_per_vertex: int = 1,
    salt: str = "walk",
    layout: str = "array",
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(walk_id string, step int, entity string): for every
    vertex, ``walks_per_vertex`` deterministic walks of up to ``length``
    steps (step 0 = the start vertex; a walk stops early at a dangling
    vertex). See module docstring for the choice rule."""
    if length < 0:
        raise ValueError(f"random_walks: length must be >= 0, got {length}")
    if walks_per_vertex < 1:
        raise ValueError(
            f"random_walks: walks_per_vertex must be >= 1, got {walks_per_vertex}"
        )
    if layout not in ("array", "expand"):
        raise ValueError(f"random_walks: unknown layout {layout!r}")
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    # private column names (_from/_to): each step re-joins adj against a
    # frontier DERIVED from adj, and shared attribute names would trip
    # Spark's ambiguous-self-join analysis
    if layout == "array":
        adj = (
            edges.select("src", "dst")
            .groupBy("src")
            .agg(
                F.sort_array(F.collect_list("dst")).alias("nbrs"),
                F.count("*").alias("deg"),
            )
            .select(F.col("src").alias("_from"), "nbrs", "deg")
            .repartition(partitions, "_from")
            .persist()
        )
    else:
        wspec = W.partitionBy("src").orderBy("dst")
        adj = (
            edges.select("src", "dst")
            .withColumn("rnk", F.row_number().over(wspec) - 1)
            .withColumn("deg", F.count("*").over(W.partitionBy("src")))
            .select(
                F.col("src").alias("_from"), F.col("dst").alias("_to"), "rnk", "deg"
            )
            .repartition(partitions, "_from")
            .persist()
        )
    adj.count()

    cur = vertices.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)),
                lambda j: F.concat(F.col("entity"), F.lit("#"), j.cast("string")),
            )
        ).alias("walk_id"),
        F.col("entity").alias("cur"),
    ).persist()
    cur.count()

    frames = [
        cur.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("entity"))
    ]
    for t in range(1, length + 1):
        h = _hash48(
            F.concat(F.lit(f"{salt}:"), F.col("walk_id"), F.lit(f":{t}"))
        )
        if layout == "array":
            nxt = cur.join(adj, cur["cur"] == adj["_from"], "inner").select(
                "walk_id",
                F.element_at(F.col("nbrs"), ((h % F.col("deg")) + 1).cast("int")).alias(
                    "cur"
                ),
            )
        else:
            nxt = cur.join(
                adj,
                (cur["cur"] == adj["_from"]) & (adj["rnk"] == h % adj["deg"]),
                "inner",
            ).select("walk_id", adj["_to"].alias("cur"))
        # localCheckpoint, not persist: (a) severs lineage so step t+1's
        # re-join against adj is not an ambiguous self-join (the frontier
        # IS derived from adj), (b) keeps the plan O(1) in t instead of a
        # t-deep join tower
        nxt = nxt.localCheckpoint(eager=True)
        frames.append(
            nxt.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("entity"))
        )
        cur = nxt

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # checkpointed step frames back the lazy union; adj can go once the
    # last step is materialized (bfs.py precedent: intermediates
    # released, result backed)
    adj.unpersist()
    return out


def skipgram_pairs(walks: DataFrame, *, window: int = 2) -> DataFrame:
    """Walk corpus → skip-gram training pairs: → (center, context,
    pair_count) for every ordered pair of walk positions within
    ``window`` steps of each other (both directions — the symmetric
    window word2vec/DeepWalk uses; Perozzi et al., "DeepWalk", KDD 2014).

    This is the graph→embedding bridge: random_walks() linearizes the
    graph into "sentences", this operator turns them into the
    (center, context) co-occurrence corpus an SGNS/PPMI embedding trains
    on (the PPMI factorization equivalence: Levy & Goldberg 2014 — the
    token-side analog is operators.cooccur.pmi_pairs).

    Scale shape: one 1:1 equi-join per offset d (join on
    (walk_id, step = step + d)) — NEVER a per-walk self-join (which is
    O(L²) rows per walk before filtering; at DeepWalk's L=80 that is
    6400× per-walk blowup vs this plan's L·window). The union feeds one
    map-side-combinable hash agg; hot centers (hub vertices reached by
    many walks) collapse map-side exactly like hot tokens in vocab_topk.

    All-integer output — hash-exact across engines, no float rounding."""
    if window < 1:
        raise ValueError(f"skipgram_pairs: window must be ≥ 1, got {window}")
    ev = None
    for d in range(1, window + 1):
        right = walks.select(
            "walk_id", (F.col("step") - d).alias("step"), F.col("entity").alias("ctx")
        )
        pairs_d = walks.join(right, ["walk_id", "step"]).select(
            F.col("entity").alias("x"), F.col("ctx").alias("y")
        )
        ev = pairs_d if ev is None else ev.unionByName(pairs_d)
    directed = ev.select(F.col("x").alias("center"), F.col("y").alias("context")).unionByName(
        ev.select(F.col("y").alias("center"), F.col("x").alias("context"))
    )
    return directed.groupBy("center", "context").agg(F.count("*").alias("pair_count"))
