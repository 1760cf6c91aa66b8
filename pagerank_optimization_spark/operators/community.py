"""Community-quality metrics: directed modularity of a vertex labeling.

The engine produces labelings (connected components, label propagation);
a pipeline that runs them needs the standard quality number to compare
parameterizations — Newman–Leicht directed modularity (Leicht & Newman
2008):

    Q = (1/m) Σ_ij [A_ij − kout_i·kin_j / m] δ(c_i, c_j)
      = Σ_c [ e_c/m − (dout_c/m)·(din_c/m) ]

with m = |directed edges|, e_c = edges inside community c, dout_c/din_c
the community's total out/in degree.

Scale notes (100 TB lens): two label-lookup joins on the edge list (the
same gather shape as one PageRank superstep — hub-split-able the same
way), then three map-side-combinable aggregations over community labels
and one |communities|-sized join. No collect; the result is a single-row
DataFrame built by crossJoining 1-row aggregates (broadcast NL joins of
literal-sized frames). All count arithmetic stays integral inside
float64 (< 2^53), so the metric is bit-reproducible and oracle-checkable
at 8 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    label_col: str = "label",
    round_to: int = 8,
) -> DataFrame:
    """→ 1-row DataFrame(n_communities, modularity): directed modularity
    of ``labels`` (entity, label) over ``edges`` (src, dst). Vertices
    missing from ``labels`` drop out of the edge terms (inner joins);
    n_communities counts distinct labels over the full labeling."""
    lab_s = labels.select(
        F.col("entity").alias("src"), F.col(label_col).alias("sl")
    )
    lab_d = labels.select(
        F.col("entity").alias("dst"), F.col(label_col).alias("dl")
    )
    el = (
        edges.select("src", "dst")
        .join(lab_s, "src")
        .join(lab_d, "dst")
        .select("sl", "dl")
    )
    tot = el.agg(F.count("*").cast("double").alias("m"))
    within = el.where(F.col("sl") == F.col("dl")).agg(
        F.count("*").cast("double").alias("w")
    )
    douts = el.groupBy(F.col("sl").alias("lab")).agg(
        F.count("*").cast("double").alias("dout")
    )
    dins = el.groupBy(F.col("dl").alias("lab")).agg(
        F.count("*").cast("double").alias("din")
    )
    dd = douts.join(dins, "lab").agg(
        F.coalesce(F.sum(F.col("dout") * F.col("din")), F.lit(0.0)).alias("x")
    )
    nc = labels.agg(F.countDistinct(label_col).alias("n_communities"))
    return (
        nc.crossJoin(within)
        .crossJoin(tot)
        .crossJoin(dd)
        .select(
            "n_communities",
            F.round(
                F.col("w") / F.col("m")
                - F.col("x") / (F.col("m") * F.col("m")),
                round_to,
            ).alias("modularity"),
        )
    )


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    *,
    label_col: str = "label",
    round_to: int = 8,
) -> DataFrame:
    """→ DataFrame(label, n_members, cut_edges, volume, conductance):
    per-community conductance φ(C) = cut(C) / min(vol(C), vol(V̄)) of any
    (entity, label) labeling over the directed edge list — the
    boundary-quality complement of ``modularity`` (a community can score
    high modularity yet leak; φ is what a partition-quality audit reads,
    Kannan/Vempala/Vetta 2004). Conventions: each directed edge
    contributes one endpoint of volume to EACH side's community and, if
    the endpoints' labels differ, one cut edge to each — i.e. the
    undirected-multigraph reading of the directed list, so Σ volume =
    2|E| exactly. A community with zero incident edges (or the whole
    graph as one community) has an empty boundary — φ reported as 0.0,
    mirrored by the twin's CASE guard.

    Scale shape: two label-lookup joins onto the edge list (the
    modularity pattern — AQE-planned, no forced |V| broadcast), then ONE
    map-side-combinable groupBy(label) over the exploded endpoint rows:
    count/sum partials absorb the giant-component hot label the same way
    the vocab histogram absorbs "the". Total volume rides the plan as a
    broadcast one-row aggregate — zero collects."""
    lab = labels.select("entity", F.col(label_col).alias("label"))
    members = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    el = (
        edges.select("src", "dst")
        .join(lab.select(F.col("entity").alias("src"), F.col("label").alias("sl")), "src")
        .join(lab.select(F.col("entity").alias("dst"), F.col("label").alias("dl")), "dst")
        .select("sl", "dl")
    )
    is_cut = (F.col("sl") != F.col("dl")).cast("long")
    sides = el.select(F.col("sl").alias("label"), is_cut.alias("cut")).unionByName(
        el.select(F.col("dl").alias("label"), is_cut.alias("cut"))
    )
    per = sides.groupBy("label").agg(
        F.count(F.lit(1)).alias("volume"), F.sum("cut").alias("cut_edges")
    )
    two_e = sides.agg(F.count(F.lit(1)).alias("two_e"))
    denom = F.least(F.col("volume"), F.col("two_e") - F.col("volume"))
    return (
        members.join(per, "label", "left")
        .crossJoin(F.broadcast(two_e))
        .select(
            "label",
            "n_members",
            F.coalesce("cut_edges", F.lit(0).cast("long")).alias("cut_edges"),
            F.coalesce("volume", F.lit(0).cast("long")).alias("volume"),
            F.when(
                denom > 0,
                F.round(F.col("cut_edges").cast("double") / denom, round_to),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )
