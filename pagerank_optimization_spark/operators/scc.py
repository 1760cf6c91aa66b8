"""Strongly connected components — FW-BW coloring over the DIRECTED
edge table (the bowtie decomposition primitive for link graphs; WCC in
operators.components ignores direction, SCC is the directed complement).

Algorithm (the "coloring" FW-BW of Orzan 2004 / Slota et al. 2014, as
synchronous DataFrame rounds):

outer round, until every vertex is assigned:
  1. FORWARD min-label fixpoint on the active subgraph:
     f(v) = min({v} ∪ {f(u) : u → v}) — after convergence f(v) is the
     lexicographic-min active vertex that can reach v ("v's color").
  2. BACKWARD within-color mark from the color roots (f(r) = r): marked
     vertices are those that can reach their own root through vertices
     of the SAME color. The coloring lemma makes the color restriction
     exact: every vertex on a v→r path (f(v) = r) is itself reachable
     from r and reaches r, so it is in SCC(r) and must carry color r —
     any smaller-id ancestor of a path vertex would also be a smaller
     ancestor of v, contradicting f(v) = r.
  3. marked vertices form complete SCCs (scc_id = their color); remove
     them and repeat on the shrunken subgraph.

Determinism: scc_id is the lexicographic-min entity of the SCC — same
contract as components.connected_components, exact per the north rule.

Scale notes (100 TB lens):
- Every step is gather-scatter shaped: the forward step is the SpMV
  gather join of pagerank/_step with (min, id) algebra on DIRECTED
  edges; the backward step is a frontier-only semi-join expansion (the
  bfs.py discipline — each round touches edges into the new frontier
  only, never the whole reach set).
- min is map-side combinable, so the per-round groupBy absorbs hub
  fan-in in partials (the same argument as components._step; the
  gather salting of plans.partitioning composes here unchanged if a
  measured hub profile demands it).
- Outer-round count is graph-dependent: each round extracts EVERY
  color-root SCC in parallel, so conversation-shaped graphs finish in
  a couple of rounds (measured: 2 on the sf events graph); a long
  condensation chain degrades toward one root per round — the classic
  FW-BW bound — which ``max_rounds`` surfaces as an explicit error
  rather than an unbounded job.
- Per-round state is localCheckpointed (plan O(1) in rounds) and the
  active vertex/edge sets shrink monotonically.

The oracle twin (plans.oracle_sql.scc_query_sql) is the SEMANTIC
definition — mutual reachability via a recursive transitive closure —
feasible at oracle scale and independent of this loop's structure, so
parity checks the algorithm, not a replay of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fixpoint_forward(f: DataFrame, active_e: DataFrame, max_rounds: int) -> DataFrame:
    """Iterate f(v) ← min(f(v), min_{u→v} f(u)) to convergence."""
    for _ in range(max_rounds):
        cand = (
            active_e.join(f.select(F.col("entity").alias("src"), "f"), "src")
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.min("f").alias("nf"))
        )
        nf = (
            f.join(cand, "entity", "left")
            .select(
                "entity",
                F.least(F.col("f"), F.coalesce(F.col("nf"), F.col("f"))).alias("f"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            nf.withColumnRenamed("f", "new_f")
            .join(f, "entity")
            .filter(F.col("new_f") != F.col("f"))
            .count()
        )
        f = nf
        if changed == 0:
            return f
    raise RuntimeError(
        f"strongly_connected_components: forward fixpoint not reached in {max_rounds} rounds"
    )


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """→ DataFrame(entity, scc_id) with scc_id = lexicographic-min entity
    of the strongly connected component (singleton vertices map to
    themselves). ``max_rounds`` bounds BOTH the outer peeling loop and
    each inner fixpoint — a pathological condensation chain errors out
    instead of running unbounded."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    from pagerank_optimization_spark.session import iterative_conf

    active_v = vertices.select("entity").localCheckpoint(eager=True)
    active_e = edges.select("src", "dst").localCheckpoint(eager=True)
    # scale-adaptive loop width (r6): caller's value caps, |E| decides
    from pagerank_optimization_spark.plans.partitioning import effective_partitions

    partitions = effective_partitions(partitions, active_e.count())
    active_e = active_e.repartition(partitions, "dst").localCheckpoint(eager=True)
    assigned: DataFrame | None = None

    with iterative_conf(spark, shuffle_partitions=partitions):
        for _outer in range(max_rounds):
            if active_v.limit(1).count() == 0:
                break
            # 1. forward coloring
            f = _fixpoint_forward(
                active_v.select("entity", F.col("entity").alias("f")).localCheckpoint(
                    eager=True
                ),
                active_e,
                max_rounds,
            ).localCheckpoint(eager=True)
            # within-color edge set, built once per outer round
            fe = (
                active_e.join(
                    f.select(F.col("entity").alias("src"), F.col("f").alias("fs")), "src"
                )
                .join(
                    f.select(F.col("entity").alias("dst"), F.col("f").alias("fd")), "dst"
                )
                .filter(F.col("fs") == F.col("fd"))
                .select("src", "dst")
                .persist()
            )
            fe.count()
            # 2. backward frontier expansion from the color roots
            marked = (
                f.filter(F.col("f") == F.col("entity"))
                .select("entity")
                .localCheckpoint(eager=True)
            )
            frontier = marked
            for _ in range(max_rounds):
                new = (
                    fe.join(frontier.select(F.col("entity").alias("dst")), "dst")
                    .select(F.col("src").alias("entity"))
                    .distinct()
                    .join(marked, "entity", "left_anti")
                    .localCheckpoint(eager=True)
                )
                if new.limit(1).count() == 0:
                    break
                marked = marked.unionByName(new).localCheckpoint(eager=True)
                frontier = new
            else:
                raise RuntimeError(
                    f"strongly_connected_components: backward mark not reached in {max_rounds} rounds"
                )
            fe.unpersist()
            # 3. peel the found SCCs
            found = (
                f.join(marked, "entity", "left_semi")
                .select("entity", F.col("f").alias("scc_id"))
                .localCheckpoint(eager=True)
            )
            assigned = (
                found
                if assigned is None
                else assigned.unionByName(found).localCheckpoint(eager=True)
            )
            active_v = active_v.join(found, "entity", "left_anti").localCheckpoint(
                eager=True
            )
            active_e = (
                active_e.join(
                    found.select(F.col("entity").alias("src")), "src", "left_anti"
                )
                .join(found.select(F.col("entity").alias("dst")), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
        else:
            raise RuntimeError(
                f"strongly_connected_components: not all vertices assigned in {max_rounds} outer rounds"
            )

    if assigned is None:
        return vertices.select("entity", F.col("entity").alias("scc_id")).limit(0)
    return assigned


def bowtie_decomposition(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """Bowtie decomposition of a directed graph (Broder et al. 2000,
    "Graph structure in the Web"): → DataFrame(entity, region) with
    region ∈ {'core', 'in', 'out', 'other'} —

    - core:  the largest SCC (ties: more members wins, then
             lexicographic-min scc_id — deterministic);
    - in:    vertices outside the core that can REACH it;
    - out:   vertices outside the core REACHABLE FROM it;
    - other: tendrils, tubes and disconnected pieces.

    'in' and 'out' are disjoint by construction: a vertex that both
    reaches and is reached by the core is mutually reachable with every
    core member, hence inside the core SCC itself.

    Plan: one SCC run (strongly_connected_components above), ONE
    bounded scalar collect to pick the core id (a 1-row TakeOrdered,
    never the component table), then two frontier-only BFS expansions —
    backward for 'in', forward for 'out' — each round touching only
    edges incident to the new frontier (the bfs.py discipline), and a
    final left-join classification. The twin
    (plans.oracle_sql.bowtie_query_sql) derives all three regions from
    the same recursive closure as the SCC twin — again the semantic
    definition, not a loop replay."""
    spark = vertices.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    scc = strongly_connected_components(
        vertices, edges, partitions=partitions, max_rounds=max_rounds
    ).localCheckpoint(eager=True)
    top = (
        scc.groupBy("scc_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc_id"))
        .limit(1)
        .collect()
    )
    if not top:
        return vertices.select("entity", F.lit("other").alias("region")).limit(0)
    core_id = top[0]["scc_id"]
    core = (
        scc.filter(F.col("scc_id") == core_id).select("entity").localCheckpoint(eager=True)
    )

    from pagerank_optimization_spark.session import iterative_conf

    e = edges.select("src", "dst").repartition(partitions, "dst").localCheckpoint(
        eager=True
    )

    def _expand(seed: DataFrame, backward: bool) -> DataFrame:
        """Frontier-only reachability closure from ``seed`` (exclusive):
        backward=True walks edges dst→src ('who reaches the seed'),
        False walks src→dst ('whom the seed reaches')."""
        hit_col, step_col = ("dst", "src") if backward else ("src", "dst")
        reached = seed
        frontier = seed
        for _ in range(max_rounds):
            new = (
                e.join(frontier.select(F.col("entity").alias(hit_col)), hit_col)
                .select(F.col(step_col).alias("entity"))
                .distinct()
                .join(reached, "entity", "left_anti")
                .localCheckpoint(eager=True)
            )
            if new.limit(1).count() == 0:
                return reached
            reached = reached.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        raise RuntimeError(
            f"bowtie_decomposition: reachability not closed in {max_rounds} rounds"
        )

    with iterative_conf(spark):
        in_side = _expand(core, backward=True)
        out_side = _expand(core, backward=False)

    return (
        vertices.select("entity")
        .join(core.select("entity", F.lit(True).alias("_core")), "entity", "left")
        .join(in_side.select("entity", F.lit(True).alias("_in")), "entity", "left")
        .join(out_side.select("entity", F.lit(True).alias("_out")), "entity", "left")
        .select(
            "entity",
            F.when(F.col("_core"), F.lit("core"))
            .when(F.col("_in"), F.lit("in"))
            .when(F.col("_out"), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("region"),
        )
    )
