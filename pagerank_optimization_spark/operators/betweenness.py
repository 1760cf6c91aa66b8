"""Betweenness centrality — sampled Brandes on the directed link graph
(engine-brief addition; the reference is PageRank-only, but betweenness
is the other canonical web-graph importance measure: bc(v) = how much
shortest-path traffic crosses v, the broker/chokepoint score the
walk-stationary family (PageRank/SALSA) cannot see).

Brandes (2001): for each source s, a BFS forward pass computes per-vertex
shortest-path counts σ_s(v), then a reverse level-order pass accumulates
dependencies

    δ_s(v) = Σ_{w: (v,w)∈E, d_s(w)=d_s(v)+1}  σ_s(v)/σ_s(w) · (1 + δ_s(w))

and bc(v) = Σ_s δ_s(v). Exact Brandes is O(|V|·|E|) — out of the question
at web scale — so the production form is the standard pivot-sampled
estimator (Brandes & Pich 2007): run the two passes from a deterministic
sample of sources, bounded to ``max_depth`` hops (traffic through paths
longer than D is both rare and semantically weak in link graphs; the
bound also makes the operator oracle-checkable round-for-round). Pivots
are chosen by portable MD5 order so runs/engines/partitionings agree
(the sampling.py MD5-bucket convention — no rand()).

Scale shape: all |S| sources advance TOGETHER — the forward pass is one
frontier-join + map-side-combinable groupBy((s,v)) per level (the bfs.py
multi-source loop carrying a σ-sum instead of min-dist), the backward
pass one (level ⋈ edges ⋈ next-level-δ) join per level. Depth-bounded:
2·D rounds total regardless of |S|; state is Σ_s |ball_D(s)| pair rows,
linear in sources. No per-source driver loop, no collect beyond the loop
scalars. Skew: the groupBy side partially aggregates (in-degree hubs
collapse map-side); the gather join inherits the graph's edge
partitioning like every other loop in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    n_sources: int | None = None,
    sources: list[str] | None = None,
    max_depth: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """→ (entity, bc double): pivot-sampled, depth-bounded Brandes
    betweenness — bc(v) = Σ over sampled sources s of the dependency
    δ_s(v), counting only shortest paths of length ≤ ``max_depth``.
    Sources: an explicit list, or the ``n_sources`` vertices first in
    portable-MD5 order (deterministic; ties broken by entity). Scores are
    8-dp rounded; vertices on no sampled path get 0.0. Exact betweenness
    (up to the depth bound) falls out of n_sources = |V|.
    """
    if max_depth < 1:
        raise ValueError(f"betweenness: max_depth must be >= 1, got {max_depth}")
    if (n_sources is None) == (sources is None):
        raise ValueError("betweenness: pass exactly one of n_sources / sources")
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    if sources is not None:
        src_df = spark.createDataFrame([(s,) for s in sources], "s string").distinct()
    else:
        if n_sources < 1:
            raise ValueError(f"betweenness: n_sources must be >= 1, got {n_sources}")
        src_df = (
            vertices.select(F.col("entity").alias("s"))
            .orderBy(F.md5(F.col("s").cast("binary")), F.col("s"))
            .limit(n_sources)
        )

    ed = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).persist()
    # scale-adaptive loop width (r6): the settled set is bounded by
    # n_sources·|V| pair rows and every round joins |E| — size the loop
    # from the edge count (caller's value stays the cluster cap)
    from pagerank_optimization_spark.plans.partitioning import effective_partitions
    from pagerank_optimization_spark.session import iterative_conf

    partitions = effective_partitions(partitions, 2 * ed.count())

    # ---- forward pass: settled(s, v, d, sigma) --------------------------
    settled = (
        src_df.select("s", F.col("s").alias("v"), F.lit(0).alias("d"), F.lit(1.0).alias("sigma"))
        .repartition(partitions, "s", "v")
        .localCheckpoint(eager=True)
    )
    deepest = 0
    _ic = iterative_conf(spark, shuffle_partitions=partitions)
    _ic.__enter__()
    try:
      for rnd in range(1, max_depth + 1):
          cand = (
              settled.filter(F.col("d") == rnd - 1)
              .join(ed, "v")
              .groupBy("s", F.col("w").alias("v"))
              .agg(F.sum("sigma").alias("sigma"))
          )
          new = (
              cand.join(settled.select("s", "v"), ["s", "v"], "left_anti")
              .select("s", "v", F.lit(rnd).alias("d"), "sigma")
          )
          nxt = (
              settled.unionByName(new)
              .repartition(partitions, "s", "v")
              .localCheckpoint(eager=True)
          )
          grew = nxt.count() > settled.count()
          settled = nxt
          if not grew:
              break
          deepest = rnd

      # ---- backward pass: δ per level, deepest first ----------------------
      # level ``deepest`` seeds δ = 0 (its successors lie beyond the bound);
      # each shallower level gathers σ_v/σ_w·(1+δ_w) from its children.
      acc: DataFrame | None = None
      delta_next = (
          settled.filter(F.col("d") == deepest)
          .select("s", "v", "sigma", F.lit(0.0).alias("delta"))
          .localCheckpoint(eager=True)
      )
      for lvl in range(deepest - 1, 0, -1):
          level = settled.filter(F.col("d") == lvl).select("s", "v", "sigma")
          child = (
              level.join(ed, "v")
              .join(
                  delta_next.select(
                      "s", F.col("v").alias("w"), F.col("sigma").alias("wsig"), "delta"
                  ),
                  ["s", "w"],
              )
              .groupBy("s", "v")
              .agg(
                  F.sum(F.col("sigma") / F.col("wsig") * (F.lit(1.0) + F.col("delta"))).alias(
                      "dep"
                  )
              )
          )
          cur = (
              level.join(child, ["s", "v"], "left")
              .select("s", "v", "sigma", F.coalesce("dep", F.lit(0.0)).alias("delta"))
              .localCheckpoint(eager=True)
          )
          acc = cur.select("v", "delta") if acc is None else acc.unionByName(
              cur.select("v", "delta")
          )
          delta_next = cur
      if deepest == 1:
          # only one level beyond the sources: every reached vertex carries
          # δ = 0 (no counted successors), so bc is identically 0 — but keep
          # the densified-zero result shape
          acc = delta_next.select("v", "delta")

    finally:
        _ic.__exit__(None, None, None)
    ed.unpersist()
    if acc is None:  # no source reached anything
        return vertices.select("entity", F.lit(0.0).alias("bc"))
    bc = acc.groupBy(F.col("v").alias("entity")).agg(F.round(F.sum("delta"), 8).alias("bc"))
    return (
        vertices.select("entity")
        .join(bc, "entity", "left")
        .select("entity", F.coalesce("bc", F.lit(0.0)).alias("bc"))
    )
