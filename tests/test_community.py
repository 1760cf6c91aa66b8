"""Tests for directed modularity: closed-form identities (single
community → exactly 0; two disconnected cliques → known positive value)
and a pure-python recompute on a random labeled graph."""

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.community import modularity


def _mk(spark, edges, labels):
    e = spark.createDataFrame(edges, "src string, dst string")
    l = spark.createDataFrame(labels, "entity string, label string")
    return e, l


def _python_q(edges, labels):
    lab = dict(labels)
    el = [(lab[s], lab[d]) for s, d in edges if s in lab and d in lab]
    m = float(len(el))
    w = sum(1.0 for s, d in el if s == d)
    dout, din = {}, {}
    for s, d in el:
        dout[s] = dout.get(s, 0.0) + 1.0
        din[d] = din.get(d, 0.0) + 1.0
    x = sum(dout[c] * din.get(c, 0.0) for c in dout)
    return w / m - x / (m * m)


def test_single_community_is_zero(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    labels = [(v, "one") for v in "abc"]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 1
    assert row.modularity == 0.0


def test_two_cliques(spark):
    edges = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
    ]
    labels = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 2
    # each community: e_c/m = 2/4, (dout·din)/m² = 4/16 → Q = 2·(0.5−0.25)/...
    assert row.modularity == pytest.approx(_python_q(edges, labels), abs=1e-9)
    assert row.modularity == pytest.approx(0.5, abs=1e-9)


def test_matches_python_recompute(spark):
    # deterministic pseudo-random labeled digraph
    verts = [f"v{i}" for i in range(30)]
    edges = [
        (verts[(7 * i) % 30], verts[(11 * i + 3) % 30])
        for i in range(120)
        if (7 * i) % 30 != (11 * i + 3) % 30
    ]
    edges = sorted(set(edges))
    labels = [(v, f"c{i % 4}") for i, v in enumerate(verts)]
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 4
    assert row.modularity == pytest.approx(
        round(_python_q(edges, labels), 8), abs=1e-9
    )


def test_unlabeled_vertices_drop_from_edge_terms(spark):
    edges = [("a", "b"), ("b", "z"), ("z", "a")]
    labels = [("a", "x"), ("b", "x")]  # z unlabeled
    e, l = _mk(spark, edges, labels)
    row = modularity(e, l).collect()[0]
    assert row.n_communities == 1
    # only a→b survives the label joins → one within-edge, m=1 → Q=0
    assert row.modularity == 0.0


# --- conductance --------------------------------------------------------


def _python_conductance(edges, labels):
    lab = dict(labels)
    vol, cut = {}, {}
    for s, d in edges:
        sl, dl = lab[s], lab[d]
        vol[sl] = vol.get(sl, 0) + 1
        vol[dl] = vol.get(dl, 0) + 1
        if sl != dl:
            cut[sl] = cut.get(sl, 0) + 1
            cut[dl] = cut.get(dl, 0) + 1
    two_e = 2 * len(edges)
    mem = {}
    for _, l in labels:
        mem[l] = mem.get(l, 0) + 1
    out = {}
    for l, n in mem.items():
        v = vol.get(l, 0)
        denom = min(v, two_e - v)
        phi = round(cut.get(l, 0) / denom, 8) if denom > 0 else 0.0
        out[l] = (n, cut.get(l, 0), v, phi)
    return out


def test_conductance_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge: each community has
    vol = 7 (6 internal endpoints + 1 bridge endpoint), cut = 1,
    φ = 1/7 exactly."""
    from pagerank_optimization_spark.operators.community import conductance

    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("a1", "b1"),
    ]
    labels = [(v, v[0]) for v in ["a1", "a2", "a3", "b1", "b2", "b3"]]
    e, l = _mk(spark, edges, labels)
    got = {r.label: (r.n_members, r.cut_edges, r.volume, r.conductance)
           for r in conductance(e, l).collect()}
    assert got == {"a": (3, 1, 7, round(1 / 7, 8)), "b": (3, 1, 7, round(1 / 7, 8))}


def test_conductance_matches_python_on_lpa_labeling(spark):
    """Full differential on a real labeling (4-round LPA over the
    synthesized transcript graph) — the driver query's exact shape."""
    from pagerank_optimization_spark.operators.community import conductance
    from pagerank_optimization_spark.operators.graph_build import build_graph
    from pagerank_optimization_spark.operators.lpa import label_propagation
    from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, 150, seed=7)
    vertices, edges = build_graph(t)
    labels = label_propagation(vertices, edges, rounds=4)
    e_rows = [(r.src, r.dst) for r in edges.select("src", "dst").collect()]
    l_rows = [(r.entity, r.label) for r in labels.collect()]
    want = _python_conductance(e_rows, l_rows)
    got = {r.label: (r.n_members, r.cut_edges, r.volume, r.conductance)
           for r in conductance(edges, labels).collect()}
    assert got == want
    assert any(phi > 0 for (_, _, _, phi) in got.values()), "no nonzero cut — vacuous"


def test_conductance_single_community_is_zero(spark):
    """The whole graph as one community: empty boundary → φ = 0 by the
    documented convention (denominator 0 guarded)."""
    from pagerank_optimization_spark.operators.community import conductance

    edges = [("a", "b"), ("b", "c")]
    labels = [("a", "x"), ("b", "x"), ("c", "x")]
    e, l = _mk(spark, edges, labels)
    rows = conductance(e, l).collect()
    assert len(rows) == 1
    assert rows[0].conductance == 0.0 and rows[0].volume == 4 and rows[0].cut_edges == 0


def test_conductance_isolated_community_is_zero(spark):
    """A label with no incident edges keeps its member count and reads
    φ = 0 / volume 0 (left join + coalesce path)."""
    from pagerank_optimization_spark.operators.community import conductance

    edges = [("a", "b")]
    labels = [("a", "x"), ("b", "x"), ("z", "lonely")]
    e, l = _mk(spark, edges, labels)
    got = {r.label: (r.n_members, r.cut_edges, r.volume, r.conductance)
           for r in conductance(e, l).collect()}
    assert got["lonely"] == (1, 0, 0, 0.0)
