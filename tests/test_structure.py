"""Tests for structural near-dup (neighbor-set Jaccard): python
recompute on a hand graph, direction semantics, and the hot-neighbor
cap's effect."""

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.structure import neighbor_jaccard_pairs

EDGES = [
    # u and v share out-neighbors {x, y}; u also → z
    ("u", "x"), ("u", "y"), ("u", "z"),
    ("v", "x"), ("v", "y"),
    # w → only z
    ("w", "z"),
    # everything also points at hub h
    ("u", "h"), ("v", "h"), ("w", "h"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string").cache()


def _python_pairs(edges, threshold, cap, direction="out"):
    sets: dict[str, set] = {}
    from collections import Counter

    i, e = (0, 1) if direction == "out" else (1, 0)
    freq = Counter(t[e] for t in edges)
    for t in edges:
        if freq[t[e]] <= cap:
            sets.setdefault(t[i], set()).add(t[e])
    out = []
    ks = sorted(sets)
    for x in ks:
        for y in ks:
            if x < y:
                inter = len(sets[x] & sets[y])
                if inter:
                    j = inter / len(sets[x] | sets[y])
                    if j >= threshold:
                        out.append((x, y, round(j, 8)))
    return sorted(out)


def test_matches_python_recompute(edges):
    got = sorted(
        (r.a, r.b, r.jaccard)
        for r in neighbor_jaccard_pairs(
            edges, threshold=0.3, max_neighbor_freq=1000
        ).collect()
    )
    assert got == _python_pairs(EDGES, 0.3, 1000)
    assert ("u", "v", round(3 / 4, 8)) in got  # {x,y,h} vs {x,y,h} ∪ {z}... with h


def test_hot_neighbor_cap_drops_hub_signal(edges):
    # cap=2 drops h (freq 3); z (freq 2) stays: u={x,y,z}, v={x,y}, w={z}
    caps: dict = {}
    got = {
        (r.a, r.b): r.jaccard
        for r in neighbor_jaccard_pairs(
            edges, threshold=0.1, max_neighbor_freq=2, counters=caps
        ).collect()
    }
    assert got == {
        ("u", "v"): round(2 / 3, 8),
        ("u", "w"): round(1 / 3, 8),
    } == dict(
        ((a, b), j) for a, b, j in _python_pairs(EDGES, 0.1, 2)
    )
    assert caps["neighbors_capped"] == 1 and caps["neighbor_rows_capped"] == 3


def test_direction_in(edges):
    got = sorted(
        (r.a, r.b, r.jaccard)
        for r in neighbor_jaccard_pairs(
            edges, threshold=0.3, direction="in", max_neighbor_freq=1000
        ).collect()
    )
    assert got == _python_pairs(EDGES, 0.3, 1000, direction="in")
    # x and y are both pointed at by exactly {u, v} → jaccard 1.0
    assert ("x", "y", 1.0) in got


def test_bad_direction_raises(edges):
    with pytest.raises(ValueError):
        neighbor_jaccard_pairs(edges, direction="sideways")


def test_minhash_scale_path_recall(spark):
    """Planted structural near-dups: vertices whose out-neighbor sets are
    sliding windows over a shared pool — adjacent windows overlap 14/16
    (jaccard 7/9 ≈ 0.78). The MinHash path must recover every exact pair
    at jaccard ≥ 0.7 when verified at est ≥ 0.5, with estimates within
    MinHash error of truth."""
    from pagerank_optimization_spark.operators.structure import (
        neighbor_minhash_pairs,
    )

    rows = []
    for v in range(24):
        for j in range(16):
            rows.append((f"v{v:02d}", f"n{v + j:03d}"))
    edges = spark.createDataFrame(rows, "src string, dst string")

    exact = {
        (r.a, r.b): r.jaccard
        for r in neighbor_jaccard_pairs(
            edges, threshold=0.7, max_neighbor_freq=10**9
        ).collect()
    }
    assert exact  # adjacent windows qualify
    sketch = {
        (r.a, r.b): r.est_jaccard
        for r in neighbor_minhash_pairs(
            edges, threshold=0.5, num_perm=64, bands=16
        ).collect()
    }
    missed = set(exact) - set(sketch)
    assert not missed, f"minhash path missed exact pairs: {missed}"
    for p, j in exact.items():
        assert abs(sketch[p] - j) < 0.25  # 64-perm MinHash error envelope


# --- adamic_adar_pairs ---------------------------------------------------


def _python_aa(edge_list, cap=1000, min_score=0.0, include_existing=False):
    import math
    from collections import Counter

    und = set()
    for s, d in edge_list:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    deg = Counter(b for _, b in und)
    nbrs: dict[str, set] = {}
    for a, b in und:
        if deg[b] <= cap:
            nbrs.setdefault(a, set()).add(b)
    out = {}
    ks = sorted(nbrs)
    for x in ks:
        for y in ks:
            if x < y:
                common = nbrs[x] & nbrs[y]
                if not common:
                    continue
                score = sum(1.0 / math.log(deg[w]) for w in common)
                if score >= min_score and (include_existing or (x, y) not in und):
                    out[(x, y)] = round(score, 8)
    return out


def test_adamic_adar_matches_python(edges):
    from pagerank_optimization_spark.operators.structure import adamic_adar_pairs

    got = {
        (r.a, r.b): r.aa_score
        for r in adamic_adar_pairs(edges.distinct(), max_neighbor_freq=1000).collect()
    }
    want = _python_aa(EDGES)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8)
    # prediction mode: no emitted pair is an existing undirected edge
    und = {(s, d) for s, d in EDGES} | {(d, s) for s, d in EDGES}
    assert not (got.keys() & und)


def test_adamic_adar_include_existing_and_cap(edges):
    from pagerank_optimization_spark.operators.structure import adamic_adar_pairs

    counters = {}
    got = {
        (r.a, r.b): r.aa_score
        for r in adamic_adar_pairs(
            edges.distinct(),
            max_neighbor_freq=2,
            include_existing=True,
            counters=counters,
        ).collect()
    }
    want = _python_aa(EDGES, cap=2, include_existing=True)
    assert got == {k: pytest.approx(v, abs=1e-8) for k, v in want.items()}
    assert counters["neighbors_capped"] >= 1  # hub h (and u) exceed deg 2


def test_adamic_adar_hub_vote_is_discounted(spark):
    """A pair sharing only a high-degree hub scores below a pair sharing
    a low-degree neighbor — the 1/ln(deg) discount."""
    from pagerank_optimization_spark.operators.structure import adamic_adar_pairs

    rows = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
            ("p", "w"), ("q", "w")]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = {(r.a, r.b): r.aa_score for r in adamic_adar_pairs(e).collect()}
    assert got[("p", "q")] > got[("a", "b")]


def test_graph_stats_match_python(spark):
    from pagerank_optimization_spark.operators.structure import graph_stats

    edges = [
        ("a", "b"), ("b", "a"),          # reciprocal pair
        ("a", "c"), ("c", "d"), ("d", "a"),
        ("b", "b"),                        # self-loop
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = graph_stats(df).collect()[0]
    assert r.n_edges == 6 and r.n_loops == 1
    # non-loop edges: 5; reciprocated: (a,b) and (b,a) -> 2/5
    assert abs(r.reciprocity - 0.4) < 1e-12
    import numpy as np

    od = {}
    idg = {}
    for s, d in edges:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    xs = np.array([od[s] for s, d in edges], dtype=float)
    ys = np.array([idg[d] for s, d in edges], dtype=float)
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r.out_in_assortativity - round(float(want), 8)) < 1e-9


def test_degree_histogram_matches_python(spark):
    from collections import Counter
    from math import log2

    from pagerank_optimization_spark.operators.structure import degree_histogram

    edges = [("a", "x%d" % i) for i in range(5)] + [("b", "y0")] + [
        ("c", "z%d" % i) for i in range(2)
    ] + [("d", "w%d" % i) for i in range(16)]
    df = spark.createDataFrame(edges, "src string, dst string")
    for direction, key in [("out", 0), ("in", 1)]:
        got = {r.bucket: (r.degree_lo, r.n_vertices)
               for r in degree_histogram(df, direction=direction).collect()}
        deg = Counter(e[key] for e in edges)
        want = Counter(int(log2(d)) for d in deg.values())
        assert got == {b: (2 ** b, n) for b, n in want.items()}, direction
    import pytest as _pytest

    with _pytest.raises(ValueError):
        degree_histogram(df, direction="sideways")


def test_global_rank_partition_invariant_and_correct(spark):
    from pagerank_optimization_spark.operators.ranking import global_rank
    from pyspark.sql import functions as F

    rows = [(f"k{i:03d}", float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double")
    want = {k: r + 1 for r, (k, _v) in enumerate(
        sorted(rows, key=lambda t: (-t[1], t[0])))}
    for p in (1, 3, 8):
        got = {r.k: r.rank for r in global_rank(
            df.repartition(5), [F.col("v").desc(), F.col("k").asc()],
            partitions=p).collect()}
        assert got == want, p


def test_spearman_extremes_and_python_recompute(spark):
    import numpy as np
    from pagerank_optimization_spark.operators.ranking import (
        spearman_rank_correlation,
    )

    rows = [(f"e{i:02d}", float(i)) for i in range(30)]
    a = spark.createDataFrame(rows, "entity string, pr double")
    # identical ranking -> 1.0; reversed -> -1.0
    assert spearman_rank_correlation(a, a).collect()[0].spearman == 1.0
    rev = spark.createDataFrame(
        [(k, 100.0 - v) for k, v in rows], "entity string, pr double"
    )
    assert spearman_rank_correlation(a, rev).collect()[0].spearman == -1.0
    # scrambled: matches scipy-free numpy recompute over the same tie rule
    rng = np.random.default_rng(5)
    perm = rng.permutation(30)
    b = spark.createDataFrame(
        [(rows[i][0], float(perm[i])) for i in range(30)],
        "entity string, pr double",
    )
    r = spearman_rank_correlation(a, b).collect()[0]
    ra = {k: i + 1 for i, (k, _v) in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))}
    brows = [(rows[i][0], float(perm[i])) for i in range(30)]
    rb = {k: i + 1 for i, (k, _v) in enumerate(sorted(brows, key=lambda t: (-t[1], t[0])))}
    xa = np.array([ra[k] for k, _ in rows], dtype=float)
    xb = np.array([rb[k] for k, _ in rows], dtype=float)
    want = np.corrcoef(xa, xb)[0, 1]
    assert abs(r.spearman - round(float(want), 6)) < 1e-9
    assert r.n == 30


def test_knn_curve_matches_python(spark):
    from collections import defaultdict

    from pagerank_optimization_spark.operators.structure import knn_curve

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "d")]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = {r.degree: (r.avg_neighbor_outdeg, r.n_vertices) for r in knn_curve(e).collect()}

    od = defaultdict(int)
    for s, _ in rows:
        od[s] += 1
    annd = {}
    outs = defaultdict(list)
    for s, d in rows:
        outs[s].append(od.get(d, 0))
    for s, ds in outs.items():
        annd[s] = sum(ds) / len(ds)
    by_deg = defaultdict(list)
    for s, k in od.items():
        by_deg[k].append(annd[s])
    want = {k: (round(sum(v) / len(v), 8), len(v)) for k, v in by_deg.items()}
    assert got == want


def test_tool_transitions_matches_python(spark):
    from collections import Counter, defaultdict

    from pagerank_optimization_spark.operators.sessions import tool_transitions

    rows = [
        # conv c1: search → search → debug; user turns and null tools ignored
        ("c1", 0, "user", None), ("c1", 1, "assistant", "search"),
        ("c1", 2, "user", None), ("c1", 3, "assistant", "search"),
        ("c1", 4, "user", None), ("c1", 5, "assistant", "debug"),
        # conv c2: debug → search; a toolless assistant turn is skipped over
        ("c2", 0, "assistant", "debug"), ("c2", 1, "assistant", None),
        ("c2", 2, "assistant", "search"),
        # conv c3: single call — no transition emitted
        ("c3", 0, "assistant", "pay-1"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    got = {(r.from_tool, r.to_tool): (r.n_transitions, r.prob) for r in tool_transitions(t).collect()}

    seqs = defaultdict(list)
    for conv, idx, role, tool in sorted(rows, key=lambda r: (r[0], r[1])):
        if role == "assistant" and tool is not None:
            seqs[conv].append(tool)
    c = Counter()
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            c[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in c.items():
        tot[a] += n
    want = {k: (n, round(n / tot[k[0]], 8)) for k, n in c.items()}
    assert got == want
    assert ("pay-1",) not in {k[:1] for k in got} or True  # c3 emits nothing
    assert got[("search", "search")] == (1, 0.5)
    assert got[("debug", "search")] == (1, 1.0)


def test_tool_paths_matches_python(spark):
    from collections import Counter, defaultdict

    from pagerank_optimization_spark.operators.sessions import tool_paths

    rows = [
        # c1: search → search → debug → search (two 3-chains)
        ("c1", 0, "user", None), ("c1", 1, "assistant", "search"),
        ("c1", 2, "assistant", "search"), ("c1", 3, "user", None),
        ("c1", 4, "assistant", "debug"), ("c1", 5, "assistant", "search"),
        # c2: debug → search → debug; toolless assistant turn skipped over
        ("c2", 0, "assistant", "debug"), ("c2", 1, "assistant", None),
        ("c2", 2, "assistant", "search"), ("c2", 3, "assistant", "debug"),
        # c3: only two calls — no length-3 chain
        ("c3", 0, "assistant", "pay-1"), ("c3", 1, "assistant", "pay-2"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    got = [(r.path, r.n_paths) for r in tool_paths(t, length=3, top_n=10).collect()]

    seqs = defaultdict(list)
    for conv, idx, role, tool in sorted(rows, key=lambda r: (r[0], r[1])):
        if role == "assistant" and tool is not None:
            seqs[conv].append(tool)
    c = Counter()
    for s in seqs.values():
        for i in range(len(s) - 2):
            c[">".join(s[i : i + 3])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_tool_paths_top_n_cut_is_deterministic(spark):
    """The cut orders (n DESC, path ASC) — a tie at the boundary must
    resolve lexicographically, not by partition luck."""
    from pagerank_optimization_spark.operators.sessions import tool_paths

    rows = [
        ("c1", 0, "assistant", "b"), ("c1", 1, "assistant", "b"), ("c1", 2, "assistant", "b"),
        ("c2", 0, "assistant", "a"), ("c2", 1, "assistant", "a"), ("c2", 2, "assistant", "a"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    got = [(r.path, r.n_paths) for r in tool_paths(t, length=3, top_n=1).collect()]
    assert got == [("a>a>a", 1)]


def test_tool_paths_rejects_bad_args(spark):
    from pagerank_optimization_spark.operators.sessions import tool_paths

    t = spark.createDataFrame([], "conv_id string, turn_idx int, role string, tool string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tool_paths(t, length=1)
    with _pytest.raises(ValueError):
        tool_paths(t, top_n=0)


def test_entity_trend_matches_python(spark):
    """Planted timestamps: tool A calls cluster early, tool B late; the
    python twin recomputes the midpoint split and smoothed log odds."""
    import math
    from collections import Counter
    from datetime import datetime

    from pagerank_optimization_spark.operators.sessions import entity_trend

    def ts(h):
        return datetime(2026, 1, 1, h, 0, 0)

    rows = [
        ("c1", 0, "user", None, ts(0)),
        ("c1", 1, "assistant", "a", ts(1)),
        ("c1", 2, "user", None, ts(2)),
        ("c1", 3, "assistant", "a", ts(3)),
        ("c2", 0, "user", None, ts(20)),
        ("c2", 1, "assistant", "b", ts(21)),
        ("c2", 2, "user", None, ts(22)),
        ("c2", 3, "assistant", "b", ts(23)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp_ntz"
    )
    got = {
        r.entity: (r.n_early, r.n_late, r.log_ratio)
        for r in entity_trend(t).collect()
    }

    # python twin over the same entity rule
    def ent(role, conv, tool):
        if role == "user":
            return f"conv:{conv}"
        digits = "".join(ch for ch in conv if ch.isdigit()) or "0"
        return f"agent:a{int(digits) % 17}"

    epochs = [r[4].timestamp() for r in rows]
    lo, hi = min(epochs), max(epochs)
    early, late_c = Counter(), Counter()
    for conv, idx, role, tool, when in rows:
        e = ent(role, conv, tool)
        if when.timestamp() * 2 > lo + hi:
            late_c[e] += 1
        else:
            early[e] += 1
    want = {
        e: (
            early.get(e, 0),
            late_c.get(e, 0),
            round(math.log((late_c.get(e, 0) + 1.0) / (early.get(e, 0) + 1.0)), 8),
        )
        for e in set(early) | set(late_c)
    }
    assert got == want
    # the planted split separates: c1's agent early-only, c2's late-only
    rising = [e for e, (ne, nl, lr) in got.items() if lr > 0]
    falling = [e for e, (ne, nl, lr) in got.items() if lr < 0]
    assert rising and falling


def test_entity_trend_rejects_bad_smoothing(spark):
    from pagerank_optimization_spark.operators.sessions import entity_trend

    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, tool string, ts timestamp_ntz"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        entity_trend(t, smoothing=0.0)


def test_rich_club_matches_hand_computed(spark):
    """Three interlinked hubs + leaves: the hub tier (deg > 1) is a
    3-clique, so φ(1) = 1.0; thresholds at/above the top tier have < 2
    rich vertices and undefined (NULL) phi. Loops, duplicate, and
    reversed-duplicate edges must collapse in the canonical undirected
    view before any degree is counted."""
    from pagerank_optimization_spark.operators.structure import rich_club

    edges = [
        ("h1", "h2"), ("h2", "h1"),      # reversed duplicate -> one edge
        ("h2", "h3"), ("h1", "h3"),
        ("h1", "l1"), ("h1", "l2"), ("h2", "l3"), ("l4", "h3"),
        ("h1", "h1"),                      # self-loop dropped
        ("h2", "h3"),                      # exact duplicate
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.k: (r.n_rich, r.e_rich, r.phi) for r in rich_club(df).collect()}
    # undirected degrees: h1=4, h2=h3=3, leaves=1
    assert got == {
        4: (0, 0, None),
        3: (1, 0, None),     # only h1 above; density of a 1-vertex graph undefined
        1: (3, 3, 1.0),      # the hub tier is a perfect 3-clique
    }
