"""Pure-Python/numpy oracles — an INDEPENDENT reimplementation of the
engine's semantics (entity rules, edge derivation, dense power iteration)
used as the REF side of differential tests, mirroring the reference's
REF-vs-TST harness (verify_op.c:196-254) but with float64 and deterministic
inputs (the reference's srand(time(NULL)) defect is fixed, not copied).
"""

from __future__ import annotations

import re

import numpy as np

N_AGENTS = 17


def agent_key(conv_id: str) -> str:
    digits = re.sub(r"[^0-9]", "", conv_id)
    return f"a{int(digits) % N_AGENTS}" if digits else "a0"


def turn_entity(role: str, conv_id: str, tool) -> str | None:
    if role == "user":
        return f"conv:{conv_id}"
    if role == "assistant":
        return f"agent:{agent_key(conv_id)}"
    return f"tool:{tool}" if tool is not None else None


def derive_edges(rows) -> set[tuple[str, str]]:
    """rows: iterable of dicts with conv_id, turn_idx, role, tool.
    Returns the distinct directed edge set (src, dst)."""
    by_conv: dict[str, list] = {}
    edges: set[tuple[str, str]] = set()
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        ents = []
        for r in turns:
            ent = turn_entity(r["role"], r["conv_id"], r["tool"])
            if ent is None:
                # unattributable turn: reply adjacency bridges over it
                # (engine filters null entities before the lag window)
                continue
            ents.append((r, ent))
        for i, (r, ent) in enumerate(ents):
            if i > 0:
                edges.add((ent, ents[i - 1][1]))
            if r["role"] == "assistant" and r["tool"] is not None:
                edges.add((f"agent:{agent_key(r['conv_id'])}", f"tool:{r['tool']}"))
                # tool consumption: next turn reads the tool output
                if i + 1 < len(ents):
                    edges.add((ents[i + 1][1], f"tool:{r['tool']}"))
    return edges


def vertices_of(rows, edges) -> list[str]:
    vs = set()
    for r in rows:
        ent = turn_entity(r["role"], r["conv_id"], r["tool"])
        if ent is not None:
            vs.add(ent)
    for s, d in edges:
        vs.add(s)
        vs.add(d)
    return sorted(vs)


def pagerank_dense(
    vertices: list[str],
    edges: set[tuple[str, str]],
    damping: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    reset: dict[str, float] | None = None,
) -> dict[str, float]:
    """Dense float64 power iteration with damping + dangling redistribution.
    ``reset``: optional personalized teleport distribution (normalized
    internally; missing vertices get 0)."""
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    A = np.zeros((n, n), dtype=np.float64)  # A[dst, src] = 1/outdeg(src)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, d in edges:
        outdeg[idx[s]] += 1
    for s, d in edges:
        A[idx[d], idx[s]] = 1.0 / outdeg[idx[s]]
    if reset is not None:
        r = np.zeros(n)
        for v, w in reset.items():
            r[idx[v]] = w
        r = r / r.sum()
        x = r.copy()
    else:
        r = np.full(n, 1.0 / n)
        x = np.full(n, 1.0 / n)
    dangling = outdeg == 0
    k = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(k):
        dm = x[dangling].sum()
        y = (1.0 - damping) * r + damping * (A @ x + dm * r)
        delta = np.abs(y - x).sum()
        x = y
        if fixed_iters is None and delta <= tol:
            break
    return {v: float(x[idx[v]]) for v in vertices}


def connected_components(vertices: list[str], edges: set[tuple[str, str]]) -> dict[str, str]:
    """Weakly connected components via union-find; label = min entity."""
    parent = {v: v for v in vertices}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in vertices}


def triangle_count(edges: set[tuple[str, str]]) -> int:
    und = {tuple(sorted((s, d))) for s, d in edges if s != d}
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    count = 0
    for a, bs in adj.items():
        for b in bs:
            count += len(bs & adj.get(b, set()))
    return count


def kcore(vertices: list[str], edges: set[tuple[str, str]], k: int) -> set[str]:
    """Exact k-core via repeated peeling on the undirected simple graph."""
    und = {tuple(sorted((s, d))) for s, d in edges if s != d}
    alive = set(vertices)
    while True:
        deg: dict[str, int] = {v: 0 for v in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {v for v in alive if deg[v] < k}
        if not drop:
            return alive
        alive -= drop


def bfs_distances(
    edges: set[tuple[str, str]], seeds: set[str], rounds: int | None = None
) -> dict[str, int]:
    """Multi-source directed BFS hop distances; vertices unreached (or
    beyond ``rounds``) are absent."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {v: 0 for v in seeds}
    frontier = set(seeds)
    r = 0
    while frontier and (rounds is None or r < rounds):
        r += 1
        frontier = {d for v in frontier for d in adj.get(v, ()) if d not in dist}
        for v in frontier:
            dist[v] = r
    return dist


def derive_edge_counts(rows) -> dict[tuple[str, str], int]:
    """Multigraph view: interaction multiplicity per (src, dst) — the
    python twin of graph_build.edge_multiplicities (duplicates counted,
    same three edge families as derive_edges)."""
    by_conv: dict[str, list] = {}
    counts: dict[tuple[str, str], int] = {}

    def bump(e):
        counts[e] = counts.get(e, 0) + 1

    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        ents = []
        for r in turns:
            ent = turn_entity(r["role"], r["conv_id"], r["tool"])
            if ent is None:
                continue
            ents.append((r, ent))
        for i, (r, ent) in enumerate(ents):
            if i > 0:
                bump((ent, ents[i - 1][1]))
            if r["role"] == "assistant" and r["tool"] is not None:
                bump((f"agent:{agent_key(r['conv_id'])}", f"tool:{r['tool']}"))
                if i + 1 < len(ents):
                    bump((ents[i + 1][1], f"tool:{r['tool']}"))
    return counts


def pagerank_weighted_dense(
    vertices: list[str],
    edge_counts: dict[tuple[str, str], int],
    damping: float = 0.85,
    fixed_iters: int = 5,
) -> dict[str, float]:
    """Dense K-step damped PageRank over row-stochastic count weights
    (weight = cnt / Σ_dst cnt per source)."""
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    A = np.zeros((n, n), dtype=np.float64)
    wtot = np.zeros(n, dtype=np.float64)
    for (s, d), c in edge_counts.items():
        wtot[idx[s]] += c
    for (s, d), c in edge_counts.items():
        A[idx[d], idx[s]] = c / wtot[idx[s]]
    r = np.full(n, 1.0 / n)
    x = np.full(n, 1.0 / n)
    dangling = wtot == 0
    for _ in range(fixed_iters):
        dm = x[dangling].sum()
        x = (1.0 - damping) * r + damping * (A @ x + dm * r)
    return {v: float(x[idx[v]]) for v in vertices}


def katz_dense(
    vertices: list[str],
    edges: set[tuple[str, str]],
    k: int = 5,
    alpha: float = 0.05,
    beta: float = 1.0,
) -> dict[str, float]:
    """K-round truncated Katz series x_i = β + α·Aᵀx_{i-1}, x₀ = β·1,
    L1-normalized once at the end — the twin of operators.katz.katz()."""
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    A = np.zeros((n, n), dtype=np.float64)  # A[src, dst] = 1 per edge
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    x = np.full(n, beta, dtype=np.float64)
    for _ in range(k):
        x = beta + alpha * (A.T @ x)
    x = x / x.sum()
    return {v: float(x[idx[v]]) for v in vertices}


def hits_dense(
    vertices: list[str], edges: set[tuple[str, str]], k: int = 5
) -> dict[str, tuple[float, float]]:
    """K-iteration HITS with L1 normalization after every half-step —
    the twin of operators.hits.hits(). → {entity: (auth, hub)}."""
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    A = np.zeros((n, n), dtype=np.float64)  # A[src, dst] = 1 per edge
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(k):
        a = A.T @ h
        s = a.sum()
        a = a / s if s > 0 else a * 0.0
        h = A @ a
        s = h.sum()
        h = h / s if s > 0 else h * 0.0
    return {v: (float(a[idx[v]]), float(h[idx[v]])) for v in vertices}


def salsa_dense(
    vertices: list[str], edges: set[tuple[str, str]], k: int = 5
) -> dict[str, tuple[float, float]]:
    """K-iteration SALSA (degree-normalized HITS) with L1 normalization
    after every half-step — the twin of operators.salsa.salsa().
    → {entity: (auth, hub)}."""
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    A = np.zeros((n, n), dtype=np.float64)  # A[src, dst] = 1 per edge
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    od = A.sum(axis=1)  # outdeg per src
    idg = A.sum(axis=0)  # indeg per dst
    Wf = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    Wb = np.divide(A, idg[None, :], out=np.zeros_like(A), where=idg[None, :] > 0)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(k):
        a = Wf.T @ h
        s = a.sum()
        a = a / s if s > 0 else a * 0.0
        h = Wb @ a
        s = h.sum()
        h = h / s if s > 0 else h * 0.0
    return {v: (float(a[idx[v]]), float(h[idx[v]])) for v in vertices}


def betweenness_sampled(
    vertices: list[str],
    edges: set[tuple[str, str]],
    sources: list[str],
    max_depth: int,
) -> dict[str, float]:
    """Depth-bounded Brandes from an explicit pivot list — the twin of
    operators.betweenness.betweenness(): bc(v) = Σ_s δ_s(v) counting only
    shortest paths of length ≤ max_depth. → {entity: bc} (unrounded)."""
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    bc = {v: 0.0 for v in vertices}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        frontier = [s]
        depth = 0
        while frontier and depth < max_depth:
            depth += 1
            found: dict[str, float] = {}
            for u in frontier:
                for w in adj.get(u, []):
                    if w in dist:
                        continue
                    found[w] = found.get(w, 0.0) + sigma[u]
            for w, c in found.items():
                dist[w] = depth
                sigma[w] = c
            frontier = sorted(found)
            if frontier:
                levels.append(frontier)
        delta = {v: 0.0 for v in dist}
        for dlev in range(len(levels) - 2, 0, -1):
            for v in levels[dlev]:
                tot = 0.0
                for w in adj.get(v, []):
                    if dist.get(w) == dlev + 1:
                        tot += sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] = tot
                bc[v] += tot
    return bc


def sssp_distances(
    edge_w: dict[tuple[str, str], int],
    seeds: set[str],
    rounds: int | None = None,
) -> dict[str, int]:
    """Multi-source weighted shortest paths — full Bellman-Ford, one
    relaxation sweep per round (the unrolled-SQL semantics); vertices
    unreached (or whose best path needs more than ``rounds`` edges) are
    absent. Converges when a sweep changes nothing."""
    dist = {v: 0 for v in seeds}
    r = 0
    while rounds is None or r < rounds:
        r += 1
        nxt = dict(dist)
        for (s, d), w in edge_w.items():
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        if nxt == dist:
            break
        dist = nxt
    return dist
