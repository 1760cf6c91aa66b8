"""Edge-derivation + degree + normalization unit tests against the
independent Python oracle (SURVEY.md §5 item 1/2)."""

import numpy as np
import pytest

from pagerank_optimization_spark.operators.graph_build import (
    build_edges,
    build_graph,
    build_vertices,
    out_degrees,
    vertex_ids,
)
from pagerank_optimization_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
)
from tests import oracle

HAND_ROWS = [
    # conv-0001 → digits 1 → agent a1; conv entity conv:conv-0001
    ("conv-0001", 0, "user", "t", None),
    ("conv-0001", 1, "assistant", "t", "tool-x"),
    ("conv-0001", 2, "user", "t", None),
    ("conv-0001", 3, "assistant", "t", "tool-y"),
    ("conv-0001", 4, "assistant", "t", None),  # consecutive assistant → self-loop
    # conv-0018 → digits 18 % 17 = 1 → same agent a1 (hub sharing)
    ("conv-0018", 0, "user", "t", None),
    ("conv-0018", 1, "assistant", "t", "tool-x"),
    # single-turn conversation → isolated dangling vertex
    ("conv-0099", 0, "user", "t", None),
]


def _df_from_rows(spark, rows):
    import datetime

    full = [
        (c, i, r, f"{c}:{i}:{r}", t, datetime.datetime(2024, 1, 1, 0, 0, i))
        for (c, i, r, _txt, t) in rows
    ]
    return spark.createDataFrame(full, schema=TRANSCRIPT_SCHEMA)


def _rows_as_dicts(rows):
    return [
        {"conv_id": c, "turn_idx": i, "role": r, "tool": t} for c, i, r, _txt, t in rows
    ]


def test_hand_checked_edges(spark):
    df = _df_from_rows(spark, HAND_ROWS)
    got = {(r.src, r.dst) for r in build_edges(df).collect()}
    expected = {
        ("agent:a1", "conv:conv-0001"),   # turn1 → turn0
        ("conv:conv-0001", "agent:a1"),   # turn2 → turn1
        ("agent:a1", "agent:a1"),         # turn4 → turn3 self-loop
        ("agent:a1", "tool:tool-x"),
        ("agent:a1", "tool:tool-y"),
        # tool consumption: t2 (conv entity) follows the t1 tool-x invocation;
        # t4's followup of tool-y duplicates the agent→tool-y invocation edge
        ("conv:conv-0001", "tool:tool-x"),
        ("agent:a1", "conv:conv-0018"),
        # conv-0018 reply edge duplicates (agent:a1 → conv:conv-0018)? no —
        # distinct conv entity; edge agent:a1→conv:conv-0018 comes from its turn1→turn0
    }
    assert got == expected
    assert got == oracle.derive_edges(_rows_as_dicts(HAND_ROWS))


def test_vertices_include_isolated(spark):
    df = _df_from_rows(spark, HAND_ROWS)
    edges = build_edges(df)
    vs = {r.entity for r in build_vertices(df, edges).collect()}
    assert "conv:conv-0099" in vs  # isolated single-turn conversation
    assert vs == set(oracle.vertices_of(_rows_as_dicts(HAND_ROWS), oracle.derive_edges(_rows_as_dicts(HAND_ROWS))))


def test_degrees_and_normalization(spark):
    df = _df_from_rows(spark, HAND_ROWS)
    _, wedges = build_graph(df)
    rows = wedges.collect()
    # weights per src sum to 1 (column-stochastic, pagerank.c:138-148)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.weight)
    for src, ws in by_src.items():
        assert np.isclose(sum(ws), 1.0)
        assert all(np.isclose(w, 1.0 / len(ws)) for w in ws)


def test_synthesized_transcripts_deterministic_and_skewed(spark):
    a = synthesize_transcripts(spark, 200, seed=42).orderBy("conv_id", "turn_idx").collect()
    b = synthesize_transcripts(spark, 200, seed=42).orderBy("conv_id", "turn_idx").collect()
    assert a == b  # fully deterministic (fixes the reference's srand(time(NULL)))
    assert len(a) >= 800  # ≥4 turns per conv
    # per-turn text invariant: text == conv_id:turn_idx:role:payload
    for r in a[:200]:
        assert r.text.startswith(f"{r.conv_id}:{r.turn_idx}:{r.role}:")
    # tool usage is Zipf-skewed: most-used tool ≫ median
    tools = [r.tool for r in a if r.tool is not None]
    assert len(tools) > 0
    from collections import Counter

    counts = sorted(Counter(tools).values(), reverse=True)
    assert counts[0] >= 3 * counts[len(counts) // 2]


def test_vertex_ids_dense_and_deterministic(spark):
    df = _df_from_rows(spark, HAND_ROWS)
    edges = build_edges(df)
    vs = build_vertices(df, edges)
    ids = vertex_ids(vs).collect()
    vids = sorted(r.vid for r in ids)
    assert vids == list(range(len(ids)))
    ents = [r.entity for r in sorted(ids, key=lambda r: r.vid)]
    assert ents == sorted(ents)


def _df_with_times(spark, rows):
    """rows: (conv_id, turn_idx, role, tool, minute) — explicit timestamps."""
    import datetime

    full = [
        (c, i, r, f"{c}:{i}:{r}", t, datetime.datetime(2024, 1, 1, 0, mn, 0))
        for (c, i, r, t, mn) in rows
    ]
    return spark.createDataFrame(full, schema=TRANSCRIPT_SCHEMA)


def test_decay_weights_row_stochastic_and_recency(spark):
    """edge_weights='decay': weights per src sum to 1, and between two
    same-multiplicity out-edges the more RECENT one weighs more."""
    # agent a1 talks through two convs: tool-x invoked early, tool-y late
    rows = [
        ("conv-0001", 0, "user", None, 0),
        ("conv-0001", 1, "assistant", "tool-x", 1),
        ("conv-0018", 0, "user", None, 40),
        ("conv-0018", 1, "assistant", "tool-y", 41),
    ]
    df = _df_with_times(spark, rows)
    _, wedges = build_graph(df, edge_weights="decay", decay_halflife_s=600.0)
    w = {(r.src, r.dst): r.weight for r in wedges.collect()}
    by_src = {}
    for (src, _dst), wt in w.items():
        by_src.setdefault(src, 0.0)
        by_src[src] += wt
    for src, total in by_src.items():
        assert np.isclose(total, 1.0), (src, total)
    # a1's tool-y interaction is 40 min fresher than tool-x (halflife 10 min)
    assert w[("agent:a1", "tool:tool-y")] > 4 * w[("agent:a1", "tool:tool-x")]


def test_decay_weights_time_shift_invariant_and_count_limit(spark):
    """Per-source anchor: shifting ALL timestamps by a constant leaves
    weights bitwise-unchanged; halflife → ∞ reproduces count weights."""
    import datetime

    rows = [
        ("conv-0001", 0, "user", None, 0),
        ("conv-0001", 1, "assistant", "tool-x", 1),
        ("conv-0001", 2, "user", None, 2),
        ("conv-0001", 3, "assistant", "tool-y", 30),
    ]
    df = _df_with_times(spark, rows)
    shifted = [
        (c, i, r, f"{c}:{i}:{r}", t, datetime.datetime(2027, 6, 5, 12, mn, 0))
        for (c, i, r, t, mn) in rows
    ]
    df2 = spark.createDataFrame(shifted, schema=TRANSCRIPT_SCHEMA)
    w1 = {(r.src, r.dst): r.weight
          for r in build_graph(df, edge_weights="decay", decay_halflife_s=600.0)[1].collect()}
    w2 = {(r.src, r.dst): r.weight
          for r in build_graph(df2, edge_weights="decay", decay_halflife_s=600.0)[1].collect()}
    assert w1 == w2
    # gigantic halflife: every occurrence ~1.0 → weights → cnt/total
    winf = {(r.src, r.dst): r.weight
            for r in build_graph(df, edge_weights="decay", decay_halflife_s=1e15)[1].collect()}
    wcnt = {(r.src, r.dst): r.weight
            for r in build_graph(df, edge_weights="count")[1].collect()}
    assert set(winf) == set(wcnt)
    for k in wcnt:
        assert np.isclose(winf[k], wcnt[k], atol=1e-9), (k, winf[k], wcnt[k])


def test_decay_rejects_nonpositive_halflife(spark):
    df = _df_from_rows(spark, HAND_ROWS)
    with pytest.raises(ValueError):
        build_graph(df, edge_weights="decay", decay_halflife_s=0.0)
