"""DuckDB SQL twins for the documents/embeddings pipeline operators
(dedup, text stats, similarity) — same contract as plans.oracle_sql: each
builder reproduces the Spark operator's math exactly, floats rounded to 8
decimals on both sides.

Tokenization parity contract (Spark ⇄ DuckDB):
  tokens   = nonempty pieces of lower(text) split on \\s+
  shingle  = space-joined k consecutive tokens
  norm     = trim(lower(text) with [^a-z0-9]+ → single space)
"""

from __future__ import annotations

from pagerank_optimization_spark.functions.text import POLY_H0, POLY_P, STOPWORDS
from pagerank_optimization_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    SIMHASH_ROUNDS,
)

TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
NORM = r"trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


def _poly(expr: str) -> str:
    """DuckDB twin of functions.text.poly_hash_expr — identical fold,
    identical modulus, identical empty-string behavior (→ H0)."""
    return (
        f"list_reduce(list_prepend({POLY_H0}::BIGINT, "
        f"list_transform(list_filter(string_split({expr}, ''), c -> c <> ''), "
        f"c -> ord(c)::BIGINT)), (a, x) -> (a*31 + x) % {POLY_P})"
    )


def docs_token_stats_sql() -> str:
    """doc_id, n_tok, mean_word_len, punct_ratio — mirrors
    functions.text.{token_count,mean_word_len,punct_ratio}_expr."""
    return rf"""
WITH t AS (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tok,
       round(length(regexp_replace(lower(text), '\s+', '', 'g'))
             / greatest(len(toks), 1), 6) AS mean_word_len,
       round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
             / greatest(length(text), 1), 6) AS punct_ratio
FROM t
"""


def docs_exact_dedup_sql() -> str:
    """doc_id, canonical_id, n_copies — equality classes of normalized text
    (Spark groups by xxhash64 of the same normalization; identical classes
    short of a 64-bit collision)."""
    return f"""
WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY norm) AS canonical_id,
       count(*)    OVER (PARTITION BY norm) AS n_copies
FROM n
"""


def docs_ngram_jaccard_sql(
    k: int = 3, threshold: float = 0.8, max_shingle_freq: int = 1000
) -> str:
    """a, b, jaccard — exact k-gram Jaccard pairs ≥ threshold (mirrors
    operators.dedup.ngram_jaccard_pairs with the same tokenization AND the
    same max_shingle_freq skew filter — without it the twin silently
    diverges once any shingle's doc frequency exceeds the cap)."""
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS shingle
  FROM t, unnest(list_transform(
        range(1, greatest(len(toks) - {k}, 0) + 2),
        i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {k}
),
sh AS MATERIALIZED (
  -- skew guard twin: drop shingles whose doc frequency exceeds the cap,
  -- mirroring ngram_jaccard_pairs(max_shingle_freq={max_shingle_freq})
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_shingle_freq}
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 8) AS jaccard
FROM common
JOIN sizes sa ON common.a = sa.doc_id
JOIN sizes sb ON common.b = sb.doc_id
WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= {threshold}
"""


def emb_neardup_pairs_sql(threshold: float = 0.4) -> str:
    """a, b, cosine — all-pairs semantic near-duplicates (mirrors
    operators.similarity.embedding_neardup_pairs(exact=True): unit vectors
    in double, round(dot, 8) ≥ threshold is what both engines filter on,
    a < b)."""
    return f"""
WITH eu AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
eun AS MATERIALIZED (
  SELECT vec_id, list_transform(ev, x -> x / greatest(nrm, 1e-12)) AS unit FROM eu
)
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_inner_product(x.unit, y.unit), 8) AS cosine
FROM eun x JOIN eun y ON x.vec_id < y.vec_id
WHERE round(list_inner_product(x.unit, y.unit), 8) >= {threshold}
"""


def emb_cosine_topk_sql(query_ids: list[int], k: int = 10) -> str:
    """query_id, neighbor_id, cosine, rank — exact brute-force cosine top-k
    (mirrors operators.similarity.cosine_topk: double math, ties broken by
    neighbor_id asc)."""
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""
WITH u AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_inner_product(q.e, c.e) / (greatest(q.nrm, 1e-12) * greatest(c.nrm, 1e-12)) AS cos_raw
  FROM u q JOIN u c ON c.vec_id <> q.vec_id
  WHERE q.vec_id IN ({qlist})
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def docs_lang_quality_sql() -> str:
    """doc_id, lang_pred, quality, fingerprint — mirrors
    functions.text.{lang_id,quality_score,portable_fingerprint}_expr.
    The ratio comparisons are int/int divisions on both engines — the
    same rationals, so float equality in the argmax is exact."""
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"len(list_filter(toks, t -> t IN ({lst})))"

    langs = sorted(STOPWORDS)  # alphabetical = the Spark tie-break order
    ratio_cols = ",\n         ".join(
        f"{hits(lang)} / greatest(len(toks), 1) AS r_{lang}" for lang in langs
    )
    rmax = "greatest(" + ", ".join(f"r_{lang}" for lang in langs) + ")"
    winner = "CASE WHEN {rmax} <= 0.0 THEN 'und' ".format(rmax=rmax)
    for lang in langs[:-1]:
        winner += f"WHEN r_{lang} = {rmax} THEN '{lang}' "
    winner += f"ELSE '{langs[-1]}' END"
    sw_en = f"least((r_en) * 5.0, 1.0)"
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
),
r AS (
  SELECT doc_id, text, toks,
         {ratio_cols},
         len(toks) AS n_tok,
         length(regexp_replace(lower(text), '\s+', '', 'g'))
           / greatest(len(toks), 1) AS wl,
         (greatest(length(text), 1) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
           / greatest(length(text), 1) AS punct_ratio
  FROM t
)
SELECT doc_id,
       {winner} AS lang_pred,
       round(0.3 * least(n_tok / 100.0, 1.0)
           + 0.2 * (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.3 END)
           + 0.3 * {sw_en}
           + 0.2 * (1.0 - least(punct_ratio * 4.0, 1.0)), 6) AS quality,
       {_poly(NORM)} AS fingerprint
FROM r
"""


def docs_minhash_pairs_sql(
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 500,
) -> str:
    """a, b, est_jaccard — mirrors operators.dedup.minhash_lsh_pairs with
    hasher='portable': same shingles, same permutation family
    ((A_i·poly + B_i) mod P), same band keys, same bucket cap, same
    signature-match verification."""
    rows = num_perm // bands
    mins = ",\n         ".join(
        f"min((h*{MINHASH_A(i)} + {MINHASH_B(i)}) % {POLY_P}) AS m{i}"
        for i in range(num_perm)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS bh FROM sig".format(
            band=bi,
            key=", ',', ".join(f"m{bi * rows + r}" for r in range(rows)),
        )
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_perm)
    )
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS shingle
  FROM t, unnest(list_transform(
        range(1, greatest(len(toks) - {k}, 0) + 2),
        i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {k}
),
hs AS MATERIALIZED (
  SELECT doc_id, {_poly('shingle')} AS h FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
),
banded AS MATERIALIZED (
  {band_selects}
),
bsz AS (SELECT band, bh, count(*) AS bs FROM banded GROUP BY 1, 2),
b2 AS (
  SELECT banded.* FROM banded JOIN bsz USING (band, bh)
  WHERE bs <= {max_bucket_size}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM b2 x JOIN b2 y USING (band, bh)
  WHERE x.doc_id < y.doc_id
)
SELECT a, b,
       round(({matches}) / {float(num_perm)}, 8) AS est_jaccard
FROM cand
JOIN sig sa ON cand.a = sa.doc_id
JOIN sig sb ON cand.b = sb.doc_id
WHERE ({matches}) / {float(num_perm)} >= {threshold}
"""


def docs_simhash_pairs_sql(max_hamming: int = 3, bits: int = 48) -> str:
    """a, b, hamming — mirrors operators.dedup.simhash_pairs with
    hasher='portable', bits=48: same token hash + scramble, same per-bit
    majority votes, same 4-chunk pigeonhole banding, same bit_count(xor)
    verification."""
    width = bits // 4
    mask = (1 << width) - 1
    votes = ",\n         ".join(
        f"sum(CASE WHEN (g >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(bits)
    )
    chunk_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, (simhash >> {c * width}) & {mask} AS ch FROM sim"
        for c in range(4)
    )
    scramble = _poly("tok")
    for m, a in SIMHASH_ROUNDS:
        scramble = f"(({scramble}) * {m} + {a}) % {POLY_P}"
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
tok AS MATERIALIZED (
  SELECT doc_id, tk AS tok FROM t, unnest(toks) AS u(tk)
),
h AS MATERIALIZED (
  SELECT doc_id, {scramble} AS g
  FROM tok
),
votes AS MATERIALIZED (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
),
sim AS MATERIALIZED (
  SELECT doc_id, {assemble} AS simhash FROM votes
),
chunks AS MATERIALIZED (
  {chunk_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                  x.simhash AS sa, y.simhash AS sb
  FROM chunks x JOIN chunks y USING (chunk, ch)
  WHERE x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def emb_ivf_topk_sql(
    query_ids: list[int], k: int = 10, n_centroids: int = 8, nprobe: int = 3
) -> str:
    """query_id, neighbor_id, cosine, rank — mirrors
    operators.similarity.ivf_topk(init='min_id', iters=0): centroids are
    the unit vectors of the n_centroids smallest ids, assignment is
    argmax dot with cid-asc tie-break, queries probe their nprobe nearest
    centroids (same tie-break), exact cosine re-rank inside."""
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""
WITH u AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
un AS MATERIALIZED (
  SELECT vec_id, list_transform(e, x -> x / greatest(nrm, 1e-12)) AS unit FROM u
),
cents AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, unit
  FROM (SELECT vec_id, unit FROM un ORDER BY vec_id LIMIT {n_centroids})
),
assign AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT un.vec_id, c.cid,
           row_number() OVER (PARTITION BY un.vec_id
                              ORDER BY list_inner_product(un.unit, c.unit) DESC, c.cid ASC) AS rk
    FROM un CROSS JOIN cents c
  ) WHERE rk = 1
),
qprobe AS (
  SELECT query_id, cid FROM (
    SELECT un.vec_id AS query_id, c.cid,
           row_number() OVER (PARTITION BY un.vec_id
                              ORDER BY list_inner_product(un.unit, c.unit) DESC, c.cid ASC) AS rk
    FROM un CROSS JOIN cents c
    WHERE un.vec_id IN ({qlist})
  ) WHERE rk <= {nprobe}
),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_inner_product(qu.unit, cu.unit) AS cos_raw
  FROM qprobe q
  JOIN assign a ON a.cid = q.cid
  JOIN un qu ON qu.vec_id = q.query_id
  JOIN un cu ON cu.vec_id = a.vec_id
  WHERE a.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def emb_pq_topk_sql(
    query_ids: list[int],
    k: int = 10,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
) -> str:
    """query_id, neighbor_id, adc, rank — mirrors
    operators.similarity.pq_topk(init='min_id', iters=0): codebooks are
    the subvector slices of the k_codes smallest ids' unit vectors,
    per-subspace assignment is argmin L2 (key c·c − 2 x·c, ties → min
    code), ADC = sum of the query's exact subvector·centroid dots."""
    qlist = ", ".join(str(q) for q in query_ids)
    d_sub = dim // m_sub
    subs = ", ".join(f"({s})" for s in range(m_sub))
    return f"""
WITH u AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
un AS MATERIALIZED (
  SELECT vec_id, list_transform(e, x -> x / greatest(nrm, 1e-12)) AS unit FROM u
),
subs AS (SELECT * FROM (VALUES {subs}) AS t(sub)),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, unit
  FROM (SELECT vec_id, unit FROM un ORDER BY vec_id LIMIT {k_codes})
),
books AS MATERIALIZED (
  SELECT s.sub, seeds.code,
         list_slice(seeds.unit, s.sub * {d_sub} + 1, (s.sub + 1) * {d_sub}) AS cv
  FROM seeds CROSS JOIN subs s
),
sv AS MATERIALIZED (
  SELECT un.vec_id, s.sub,
         list_slice(un.unit, s.sub * {d_sub} + 1, (s.sub + 1) * {d_sub}) AS sv
  FROM un CROSS JOIN subs s
),
assign AS MATERIALIZED (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, b.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub
             ORDER BY list_inner_product(b.cv, b.cv)
                      - 2 * list_inner_product(sv.sv, b.cv) ASC, b.code ASC
           ) AS rk
    FROM sv JOIN books b ON b.sub = sv.sub
  ) WHERE rk = 1
),
lut AS (
  SELECT qs.vec_id AS query_id, qs.sub, b.code,
         list_inner_product(qs.sv, b.cv) AS part
  FROM sv qs JOIN books b ON b.sub = qs.sub
  WHERE qs.vec_id IN ({qlist})
),
scored AS (
  SELECT l.query_id, a.vec_id AS neighbor_id, sum(part) AS adc_raw
  FROM assign a JOIN lut l ON l.sub = a.sub AND l.code = a.code
  WHERE a.vec_id <> l.query_id
  GROUP BY 1, 2
),
ranked AS (
  -- rank on the ROUNDED value: the Spark side rounds adc before its
  -- window, so near-ties that collide at 8 dp must fall back to the
  -- neighbor_id tie-break on both engines identically
  SELECT query_id, neighbor_id, round(adc_raw, 8) AS adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adc_raw, 8) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, adc, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def _cc_unroll_ctes(pairs_cte: str, sym_cte: str, lbl_prefix: str, cc_rounds: int) -> str:
    """Unrolled min-label CC over a pair CTE — shared by the two cascade
    twins. AS MATERIALIZED is load-bearing: each round references the
    previous round TWICE (l and l2), so plain CTEs inline exponentially —
    2^24 plan copies wedge DuckDB at ~100 GB (observed). Materialized, the
    unroll is cc_rounds tiny scans over the pair graph."""
    ctes = [f"""{lbl_prefix}0 AS MATERIALIZED (
  SELECT v, v AS lbl FROM (SELECT a AS v FROM {pairs_cte} UNION SELECT b FROM {pairs_cte})
)"""]
    for r in range(1, cc_rounds + 1):
        ctes.append(f"""{lbl_prefix}{r} AS MATERIALIZED (
  SELECT l.v, least(l.lbl, coalesce(min(l2.lbl), l.lbl)) AS lbl
  FROM {lbl_prefix}{r - 1} l
  LEFT JOIN {sym_cte} e ON e.x = l.v
  LEFT JOIN {lbl_prefix}{r - 1} l2 ON l2.v = e.y
  GROUP BY l.v, l.lbl
)""")
    return ",\n".join(ctes)


def _cascade_minhash_prefix(
    num_perm: int,
    bands: int,
    k: int,
    threshold: float,
    max_bucket_size: int,
    cc_rounds: int,
) -> str:
    """WITH-clause chain ending at ``surv2`` (post exact + MinHash-LSH
    family-collapse survivors) and ``not_conv`` (the minhash CC unroll's
    convergence sentinel count) — the shared prefix of both cascade twins."""
    rows = num_perm // bands
    mins = ",\n         ".join(
        f"min((h*{MINHASH_A(i)} + {MINHASH_B(i)}) % {POLY_P}) AS m{i}"
        for i in range(num_perm)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS bh FROM sig".format(
            band=bi,
            key=", ',', ".join(f"m{bi * rows + r}" for r in range(rows)),
        )
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_perm)
    )
    cc_sql = _cc_unroll_ctes("pairs", "sym", "lbl", cc_rounds)
    return rf"""
WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
surv1 AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY norm) AS canonical_id FROM n
  ) WHERE doc_id = canonical_id
),
t AS MATERIALIZED (
  SELECT d.doc_id, {TOKS} AS toks FROM documents d JOIN surv1 USING (doc_id)
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS shingle
  FROM t, unnest(list_transform(
        range(1, greatest(len(toks) - {k}, 0) + 2),
        i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {k}
),
hs AS MATERIALIZED (
  SELECT doc_id, {_poly('shingle')} AS h FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
),
banded AS MATERIALIZED (
  {band_selects}
),
bsz AS (SELECT band, bh, count(*) AS bs FROM banded GROUP BY 1, 2),
b2 AS (
  SELECT banded.* FROM banded JOIN bsz USING (band, bh)
  WHERE bs <= {max_bucket_size}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM b2 x JOIN b2 y USING (band, bh)
  WHERE x.doc_id < y.doc_id
),
pairs AS MATERIALIZED (
  SELECT a, b
  FROM cand
  JOIN sig sa ON cand.a = sa.doc_id
  JOIN sig sb ON cand.b = sb.doc_id
  WHERE ({matches}) / {float(num_perm)} >= {threshold}
),
sym AS MATERIALIZED (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
),
{cc_sql},
losers AS (SELECT v FROM lbl{cc_rounds} WHERE lbl <> v),
not_conv AS (
  SELECT count(*) AS c
  FROM lbl{cc_rounds} j JOIN lbl{cc_rounds - 1} p USING (v)
  WHERE j.lbl <> p.lbl
),
surv2 AS MATERIALIZED (
  SELECT doc_id FROM surv1 WHERE doc_id NOT IN (SELECT v FROM losers)
)"""


def docs_dedup_cascade_sql(
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 500,
    cc_rounds: int = 24,
) -> str:
    """doc_id of cascade survivors — mirrors operators.dedup.dedup_cascade
    (hasher='portable', no embeddings): exact tier (min doc_id per
    normalized-text class), then the portable-MinHash banded-LSH pairs of
    docs_minhash_pairs_sql computed over the EXACT-TIER SURVIVORS, then
    the duplicate families collapsed to their min doc_id via min-label
    propagation unrolled ``cc_rounds`` rounds.

    DATA ASSUMPTION: the unroll is exact only when every duplicate
    family's min-label propagation distance is ≤ cc_rounds (the Spark side
    iterates to the true fixpoint). Families are near-dup chains of a
    handful of docs, so the default 24 carries ≥2× margin over any
    plausible family diameter at oracle scale — and the guard makes the
    assumption self-checking: if round cc_rounds still changed any label,
    the oracle emits a sentinel doc_id -1 row, so a too-shallow unroll
    fails the driver compare LOUDLY (visible bogus row) instead of
    silently disagreeing with the engine's exact fixpoint."""
    prefix = _cascade_minhash_prefix(
        num_perm, bands, k, threshold, max_bucket_size, cc_rounds
    )
    return f"""{prefix}
SELECT doc_id FROM surv2
UNION ALL
SELECT CAST(-1 AS BIGINT) AS doc_id WHERE (SELECT c FROM not_conv) > 0
"""


def docs_dedup_cascade_semantic_sql(
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 500,
    semantic_threshold: float = 0.42,
    cc_rounds: int = 24,
) -> str:
    """doc_id of THREE-TIER cascade survivors — mirrors
    operators.dedup.dedup_cascade(embeddings=..., semantic_exact=True,
    hasher='portable'): the two-tier prefix above, then exact-cosine pairs
    (round(dot of unit vectors, 8) ≥ semantic_threshold — the rounded
    value is what both engines filter on) over the MINHASH-TIER SURVIVORS'
    embeddings (joined on vec_id = doc_id), collapsed to min-doc_id
    families via the same unrolled min-label CC with its own convergence
    sentinel."""
    prefix = _cascade_minhash_prefix(
        num_perm, bands, k, threshold, max_bucket_size, cc_rounds
    )
    sem_cc = _cc_unroll_ctes("spairs", "ssym", "slbl", cc_rounds)
    return f"""{prefix},
eu AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) AS nrm
  FROM embeddings e JOIN surv2 s ON e.vec_id = s.doc_id
),
eun AS MATERIALIZED (
  SELECT vec_id, list_transform(ev, x -> x / greatest(nrm, 1e-12)) AS unit FROM eu
),
spairs AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM eun x JOIN eun y ON x.vec_id < y.vec_id
  WHERE round(list_inner_product(x.unit, y.unit), 8) >= {semantic_threshold}
),
ssym AS MATERIALIZED (
  SELECT a AS x, b AS y FROM spairs UNION SELECT b, a FROM spairs
),
{sem_cc},
slosers AS (SELECT v FROM slbl{cc_rounds} WHERE lbl <> v),
s_not_conv AS (
  SELECT count(*) AS c
  FROM slbl{cc_rounds} j JOIN slbl{cc_rounds - 1} p USING (v)
  WHERE j.lbl <> p.lbl
)
SELECT doc_id FROM surv2 WHERE doc_id NOT IN (SELECT v FROM slosers)
UNION ALL
SELECT CAST(-1 AS BIGINT) AS doc_id WHERE (SELECT c FROM not_conv) > 0
UNION ALL
SELECT CAST(-2 AS BIGINT) AS doc_id WHERE (SELECT c FROM s_not_conv) > 0
"""


def docs_bm25_topk_sql(
    terms, *, k1: float = 1.2, b: float = 0.75, top_n: int = 20, round_to: int = 6
) -> str:
    """Twin of operators.retrieval.bm25_topk — same tokenizer (TOKS), same
    Lucene-style '+1' idf, same left-associative score arithmetic, score
    rounded to ``round_to`` BEFORE the (score desc, doc_id) ordering so the
    top-n cut is reproducible across engines."""
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, {TOKS} AS tk FROM documents
),
dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
post AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ({tl})
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
scored AS (
  SELECT p.doc_id,
         round(sum(
           ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * p.tf * {k1 + 1.0!r}
           / (p.tf + {k1!r} * ({1.0 - b!r} + {b!r} * d.dl / s.avgdl))
         ), {round_to}) AS score
  FROM post p
  JOIN dfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {top_n}
"""


SAMPLE_DENOM = 1_000_000


def _sample_bucket_sql(key_expr: str, salt: str) -> str:
    """Twin of operators.sampling._sample_bucket — first 12 hex digits of
    md5('salt:key') as a 48-bit int, mod 1e6 (md5, not the poly family:
    sampling needs avalanche — see the operator's docstring)."""
    s = f"concat('{salt}', ':', CAST({key_expr} AS VARCHAR))"
    return f"CAST(concat('0x', substring(md5({s}), 1, 12)) AS BIGINT) % {SAMPLE_DENOM}"


def docs_hash_sample_sql(rate: float, *, salt: str = "") -> str:
    """Twin of operators.sampling.hash_sample on documents(doc_id)."""
    thr = int(rate * SAMPLE_DENOM)
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_sample_bucket_sql('doc_id', salt)} < {thr}
"""


def docs_weighted_reservoir_sql(n: int, *, salt: str = "wrs") -> str:
    """doc_id, es_key — twin of operators.sampling.weighted_reservoir_sample
    on documents with weight = length(text) (the A-ES ln-domain score:
    ln((h48+1)/2^48) / w, top-n DESC with doc_id tie-break)."""
    h48 = (
        f"CAST(concat('0x', substring(md5(concat('{salt}', ':', "
        "CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)"
    )
    score = f"ln(({h48} + 1) / 281474976710656.0) / length(text)"
    return f"""
SELECT doc_id, round({score}, 8) AS es_key
FROM documents
WHERE length(text) > 0
ORDER BY {score} DESC, doc_id
LIMIT {n}
"""


def docs_stratified_sample_sql(
    rates: dict, *, default_rate: float = 0.0, salt: str = ""
) -> str:
    """Twin of operators.sampling.stratified_hash_sample on
    documents(lang, doc_id)."""
    whens = "\n    ".join(
        f"WHEN lang = '{v}' THEN {int(rates[v] * SAMPLE_DENOM)}" for v in sorted(rates)
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_sample_bucket_sql('doc_id', salt)} <
  (CASE {whens} ELSE {int(default_rate * SAMPLE_DENOM)} END)
"""


def docs_pack_sql(budget: int) -> str:
    """Twin of operators.sampling.pack_documents — the same global
    token-order cumsum (here a single window; the Spark side's two-level
    scan computes the identical prefix distributively)."""
    return f"""
WITH toks AS (
  SELECT doc_id, len({TOKS}) AS n_tok FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS strt
  FROM toks
)
SELECT doc_id, n_tok,
       CAST(floor(strt / {budget}) AS BIGINT) AS bin_id,
       CAST(strt % {budget} AS BIGINT) AS offset_in_bin,
       CASE WHEN n_tok > 0
            THEN floor((strt + n_tok - 1) / {budget}) > floor(strt / {budget})
            ELSE FALSE END AS spans_boundary
FROM cum
"""


def _grams_all_sql(n: int, src: str = "documents") -> str:
    """Gram CTE body: ALL word n-gram occurrences of ``src`` (duplicates
    kept — the multiset operators.quality._grams_all builds; the dedup
    twins' DISTINCT variant collapses multiplicities)."""
    return rf"""
  SELECT doc_id, s AS gram
  FROM (SELECT doc_id, {TOKS} AS toks FROM {src}) _t,
       unnest(list_transform(
         range(1, greatest(len(toks) - {n}, 0) + 2),
         i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {n}"""


def docs_repetition_sql(ngram_n: int = 2) -> str:
    """doc_id, n_lines, dup_line_frac, total_grams, top_ngram_frac —
    twin of operators.quality.repetition_stats (Gopher-style repetition
    filters; same line normalization, same n-gram multiset)."""
    return rf"""
WITH lines AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls
  FROM documents
),
base AS (
  SELECT doc_id, len(ls) AS n_lines,
         round((len(ls) - len(list_distinct(ls))) * 1.0 / greatest(len(ls), 1), 8)
           AS dup_line_frac
  FROM lines
),
grams AS ({_grams_all_sql(ngram_n)}
),
pg AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
ga AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_grams,
              max(cnt) AS max_cnt
       FROM pg GROUP BY 1)
SELECT b.doc_id, b.n_lines, b.dup_line_frac,
       COALESCE(ga.total_grams, 0) AS total_grams,
       round(COALESCE(ga.max_cnt * 1.0 / ga.total_grams, 0.0), 8) AS top_ngram_frac
FROM base b LEFT JOIN ga ON b.doc_id = ga.doc_id
"""


def _quality_cte() -> str:
    """CTE chain ``qt/qr/q`` — q(doc_id, source, score) mirrors
    functions.text.quality_score_expr term for term (same rationals as the
    docs_lang_quality twin, so 6-dp-rounded equality is exact)."""
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return rf"""qt AS MATERIALIZED (
  SELECT doc_id, source, text, {TOKS} AS toks FROM documents
),
qr AS (
  SELECT doc_id, source,
         len(toks) AS n_tok,
         len(list_filter(toks, t -> t IN ({en}))) / greatest(len(toks), 1) AS r_en,
         length(regexp_replace(lower(text), '\s+', '', 'g'))
           / greatest(len(toks), 1) AS wl,
         (greatest(length(text), 1) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
           / greatest(length(text), 1) AS punct_ratio
  FROM qt
),
q AS (
  SELECT doc_id, source,
         round(0.3 * least(n_tok / 100.0, 1.0)
             + 0.2 * (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.3 END)
             + 0.3 * least(r_en * 5.0, 1.0)
             + 0.2 * (1.0 - least(punct_ratio * 4.0, 1.0)), 6) AS score
  FROM qr
)"""


def docs_source_cap_sql(n_per_source: int) -> str:
    """doc_id, source, score, rank — twin of operators.quality.source_cap.
    A single row_number window here; the Spark side's two-stage salted
    top-N must produce EXACTLY this (the candidate-set containment proof
    is the operator's contract)."""
    return rf"""
WITH {_quality_cte()}
SELECT doc_id, source, score, rank FROM (
  SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM q
) WHERE rank <= {n_per_source}
"""


def docs_contamination_sql(
    k: int = 3, bench_rate: float = 0.02, bench_salt: str = "bench"
) -> str:
    """doc_id, n_hit_shingles — twin of operators.quality.contamination_flags
    where the benchmark set is hash_sample(documents, bench_rate, salt) and
    the corpus is its complement (the driver query's split)."""
    thr = int(bench_rate * SAMPLE_DENOM)
    return rf"""
WITH bucketed AS MATERIALIZED (
  SELECT doc_id, text, {_sample_bucket_sql('doc_id', bench_salt)} AS bkt
  FROM documents
),
bench_sh AS (
  SELECT DISTINCT gram FROM ({_grams_all_sql(k, "(SELECT doc_id, text FROM bucketed WHERE bkt < %d) bsrc" % thr)})
),
corpus_sh AS (
  SELECT DISTINCT doc_id, gram
  FROM ({_grams_all_sql(k, "(SELECT doc_id, text FROM bucketed WHERE bkt >= %d) csrc" % thr)})
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hit_shingles
FROM corpus_sh c JOIN bench_sh b USING (gram)
GROUP BY c.doc_id
"""


def docs_dedup_lines_sql(max_line_freq: int = 1_000_000) -> str:
    """doc_id, text_clean, n_lines_kept, n_lines_dropped — twin of
    operators.quality.dedup_lines (keep-first corpus line dedup on
    NORM-keyed lines + boilerplate frequency cap). Spark's posexplode is 0-based, this
    range is 1-based; positions never surface, only their order does."""
    return rf"""
WITH ls AS MATERIALIZED (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS lns
  FROM documents
),
occ AS MATERIALIZED (
  SELECT doc_id, s.pos AS pos, s.line AS line,
         trim(regexp_replace(lower(s.line), '[^a-z0-9]+', ' ', 'g')) AS key
  FROM ls, unnest(list_transform(range(1, len(lns) + 1),
                 i -> struct_pack(pos := i, line := lns[i]))) AS u(s)
),
win AS (
  SELECT key, count(*) AS freq,
         min(struct_pack(d := doc_id, p := pos, l := line)) AS w
  FROM occ GROUP BY key
),
surv AS (
  SELECT w.d AS doc_id, w.p AS pos, w.l AS line
  FROM win WHERE freq <= {max_line_freq}
),
rec AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS text_clean,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM surv GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(rec.text_clean, '') AS text_clean,
       COALESCE(rec.n_kept, 0) AS n_lines_kept,
       len(b.lns) - COALESCE(rec.n_kept, 0) AS n_lines_dropped
FROM ls b LEFT JOIN rec USING (doc_id)
"""


def docs_vocab_topk_sql(n: int) -> str:
    """token, cf, df, rank — twin of operators.vocab.vocab_topk. Same
    tokenization (TOKS), same total order (cf DESC, token ASC) in the
    limit and the rank, so the top-N cut is deterministic on both sides."""
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
vs AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY token
)
SELECT token, cf, df,
       CAST(row_number() OVER (ORDER BY cf DESC, token ASC) AS INT) AS rank
FROM vs ORDER BY cf DESC, token ASC LIMIT {n}
"""


def docs_countmin_sql(
    *, depth: int = 4, width: int = 1024, salt: str = "cm"
) -> str:
    """d, col, cnt — twin of operators.vocab.token_countmin: every token
    occurrence hashed into depth rows with the portable MD5 family."""
    ds = ", ".join(f"({i})" for i in range(depth))
    h = (
        f"CAST(concat('0x', substring(md5(concat('{salt}:', CAST(d AS VARCHAR), "
        "':', token)), 1, 12)) AS BIGINT)"
    )
    return rf"""
WITH toks AS (
  SELECT unnest({TOKS}) AS token FROM documents
),
dd AS (SELECT * FROM (VALUES {ds}) AS t(d)),
cells AS (
  SELECT d, CAST({h} % {width} AS INT) AS col FROM toks, dd
)
SELECT CAST(d AS INT) AS d, col, CAST(count(*) AS BIGINT) AS cnt
FROM cells GROUP BY d, col
"""


def docs_bloom_contam_sql(
    *,
    k: int = 3,
    bits: int = 1 << 20,
    hashes: int = 4,
    salt: str = "bf",
    bench_rate: float = 0.02,
    bench_salt: str = "bench",
) -> str:
    """doc_id, n_flagged_shingles — twin of
    operators.quality.bloom_contamination on the docs_contamination
    split (hash-sampled benchmark vs complement corpus): every Bloom
    position reproduced with the portable MD5 family, a gram flagged
    iff all ``hashes`` probe rows land on set positions."""
    thr = int(bench_rate * SAMPLE_DENOM)
    hh = ", ".join(f"({i})" for i in range(hashes))
    pos = (
        f"CAST(CAST(concat('0x', substring(md5(concat('{salt}:', "
        f"CAST(i AS VARCHAR), ':', gram)), 1, 12)) AS BIGINT) % {bits} AS INT)"
    )
    return rf"""
WITH bucketed AS MATERIALIZED (
  SELECT doc_id, text, {_sample_bucket_sql('doc_id', bench_salt)} AS bkt
  FROM documents
),
hh AS (SELECT * FROM (VALUES {hh}) AS t(i)),
bench_sh AS (
  SELECT DISTINCT gram FROM ({_grams_all_sql(k, "(SELECT doc_id, text FROM bucketed WHERE bkt < %d) bsrc" % thr)})
),
setbits AS MATERIALIZED (
  SELECT DISTINCT {pos} AS pos FROM bench_sh, hh
),
corpus_sh AS (
  SELECT DISTINCT doc_id, gram
  FROM ({_grams_all_sql(k, "(SELECT doc_id, text FROM bucketed WHERE bkt >= %d) csrc" % thr)})
),
probes AS (
  SELECT doc_id, gram, {pos} AS pos FROM corpus_sh, hh
),
flagged AS (
  SELECT doc_id, gram
  FROM probes JOIN setbits USING (pos)
  GROUP BY doc_id, gram HAVING count(*) = {hashes}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged_shingles
FROM flagged GROUP BY doc_id
"""


def docs_token_hll_sql(*, p: int = 8, salt: str = "hll") -> str:
    """reg, rho — twin of operators.vocab.token_hll: one portable-MD5
    H48 per token occurrence, low p bits → register, trailing-zeros+1
    of the top 48−p bits → rank, max per register, zero-filled."""
    m = 1 << p
    h = f"CAST(concat('0x', substring(md5(concat('{salt}:', token)), 1, 12)) AS BIGINT)"
    return rf"""
WITH toks AS (
  SELECT unnest({TOKS}) AS token FROM documents
),
hw AS (
  SELECT CAST(h % {m} AS INT) AS reg, h // {m} AS w
  FROM (SELECT {h} AS h FROM toks)
),
ranks AS (
  SELECT reg,
         CASE WHEN w = 0 THEN {48 - p + 1}
              ELSE CAST(log2(w & (-w)) AS INT) + 1 END AS rho
  FROM hw
),
agg AS (SELECT reg, max(rho) AS rho FROM ranks GROUP BY reg)
SELECT CAST(t.r AS INT) AS reg, CAST(coalesce(a.rho, 0) AS INT) AS rho
FROM range(0, {m}) AS t(r) LEFT JOIN agg a ON a.reg = t.r
"""


def docs_dsir_sql(
    *,
    dim: int = 1024,
    k: float = 0.5,
    rate: float = 0.05,
    salt: str = "dsir",
    round_to: int = 6,
) -> str:
    """doc_id, n_feat, logw, logw_per_feat — twin of
    operators.dsir.dsir_logratios on a hash-split corpus (rate plays the
    target): unigram+bigram features, portable poly hash mod dim,
    add-k smoothed log-likelihood ratio over the full bucket domain."""
    thr = int(rate * SAMPLE_DENOM)
    tgt = "(SELECT doc_id, text FROM bucketed WHERE bkt < %d) tsrc" % thr
    raw = "(SELECT doc_id, text FROM bucketed WHERE bkt >= %d) rsrc" % thr
    b = f"CAST({_poly('gram')} % {dim} AS INT)"
    return rf"""
WITH bucketed AS MATERIALIZED (
  SELECT doc_id, text, {_sample_bucket_sql('doc_id', salt)} AS bkt
  FROM documents
),
tfeat AS (
  SELECT gram FROM (SELECT unnest({TOKS}) AS gram FROM {tgt})
  UNION ALL
  SELECT gram FROM ({_grams_all_sql(2, tgt)})
),
rfeat AS MATERIALIZED (
  SELECT doc_id, gram FROM (SELECT doc_id, unnest({TOKS}) AS gram FROM {raw})
  UNION ALL
  SELECT doc_id, gram FROM ({_grams_all_sql(2, raw)})
),
cf_t AS (SELECT {b} AS b, count(*) AS cf_t FROM tfeat GROUP BY 1),
cf_r AS (SELECT {b} AS b, count(*) AS cf_r FROM rfeat GROUP BY 1),
tot AS (
  SELECT (SELECT coalesce(sum(cf_t), 0) FROM cf_t) AS t_t,
         (SELECT coalesce(sum(cf_r), 0) FROM cf_r) AS t_r
),
model AS (
  SELECT t.r AS b,
         ln((coalesce(cf_t, 0) + {k}) / (t_t + {k * dim}))
       - ln((coalesce(cf_r, 0) + {k}) / (t_r + {k * dim})) AS lr
  FROM range(0, {dim}) AS t(r)
  LEFT JOIN cf_t ON cf_t.b = t.r
  LEFT JOIN cf_r ON cf_r.b = t.r
  CROSS JOIN tot
),
docfeat AS (
  SELECT doc_id, {b} AS b, count(*) AS c FROM rfeat GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, sum(c) AS n_feat, sum(c * lr) AS logw
  FROM docfeat JOIN model USING (b) GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(coalesce(n_feat, 0) AS BIGINT) AS n_feat,
       round(coalesce(logw, 0), {round_to}) AS logw,
       round(CASE WHEN n_feat IS NOT NULL THEN logw / n_feat ELSE 0 END,
             {round_to}) AS logw_per_feat
FROM (SELECT doc_id FROM bucketed WHERE bkt >= {thr}) r
LEFT JOIN scored USING (doc_id)
"""


def docs_quality_sample_sql(*, salt: str = "q") -> str:
    """doc_id, score — twin of operators.sampling.weighted_hash_sample
    with the quality score as the per-row keep probability: the same MD5
    bucket as hash_sample compared against score·1e6 (score mirrors
    quality_score_expr term for term via _quality_cte; both engines
    multiply the identical double by the identical constant, so the
    membership predicate is bit-equal)."""
    return rf"""
WITH {_quality_cte()}
SELECT doc_id, score FROM q
WHERE {_sample_bucket_sql('doc_id', salt)} < score * {SAMPLE_DENOM}
"""


def docs_pii_redact_sql(*, inject_every: int = 7) -> str:
    """doc_id, n_email, n_ipv4, n_ssn, n_phone, text_redacted — twin of
    operators.pii.redact_pii over the PII-injected corpus (the synthesized
    documents carry no PII by construction, so the driver query plants a
    deterministic, SQL-expressible PII suffix on every ``inject_every``-th
    doc before redacting — the rules are exercised on real matches, not
    vacuous zeros). Built from operators.pii.PII_RULES so the twin cannot
    drift from the operator; the rule regexes are written in the common
    Java-regex/RE2 subset (see pii.py docstring), making the redacted
    STRINGS comparable, not just the counts."""
    from pagerank_optimization_spark.operators.pii import PII_RULES

    inj = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.1 call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || '-1234 ssn 123-45-6789'"
    )
    ctes = [
        f"r0 AS (SELECT doc_id, CASE WHEN doc_id % {inject_every} = 0"
        f" THEN {inj} ELSE text END AS t0 FROM documents)"
    ]
    for i, (name, pat, repl) in enumerate(PII_RULES):
        carried = "".join(f"n_{n}, " for n, _, _ in PII_RULES[:i])
        ctes.append(
            f"r{i + 1} AS (SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all(t{i}, '{pat}')) AS INT) AS n_{name}, "
            f"regexp_replace(t{i}, '{pat}', '{repl}', 'g') AS t{i + 1} FROM r{i})"
        )
    names = ", ".join(f"n_{n}" for n, _, _ in PII_RULES)
    chain = ",\n".join(ctes)
    k = len(PII_RULES)
    return f"WITH {chain}\nSELECT doc_id, {names}, t{k} AS text_redacted FROM r{k}"


def docs_bpe_pairs_sql(n: int) -> str:
    """left, right, pair_count, rank — twin of
    operators.vocab.bpe_pair_counts: same tokenization, same
    word-frequency pre-aggregation, same in-word adjacent char pairs
    (DuckDB range(1, len) is end-exclusive so 1-char words contribute
    nothing, mirroring the Spark side's explicit guard), same
    (pair_count DESC, left, right) total order in the cut and the rank."""
    return rf"""
WITH toks AS (
  SELECT unnest({TOKS}) AS word FROM documents
),
words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word
),
cs AS (
  SELECT freq, list_filter(string_split(word, ''), c -> c <> '') AS c FROM words
),
pairs AS (
  SELECT freq, u.p.l AS "left", u.p.r AS "right"
  FROM cs, unnest(list_transform(range(1, len(c)),
       i -> struct_pack(l := c[i], r := c[i + 1]))) AS u(p)
),
agg AS (
  SELECT "left", "right", CAST(sum(freq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY "left", "right"
)
SELECT "left", "right", pair_count,
       CAST(row_number() OVER (ORDER BY pair_count DESC, "left" ASC, "right" ASC) AS INT) AS rank
FROM agg ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT {n}
"""


def docs_dedup_incremental_sql(
    new_rate: float = 0.2,
    salt: str = "incr",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 500,
) -> str:
    """doc_id, lang — twin of operators.dedup.dedup_against_corpus over a
    deterministic hash split of the documents table (bucket < new_rate·1e6
    plays the new batch, the rest the corpus). Same exact-stage equality
    classes (norm string ≡ the Spark side's fingerprint of it, cascade
    precedent), same shared permutation family over corpus ∪
    exact-survivors, same COMBINED bucket cap, candidates only across the
    new/corpus flag, corpus always wins."""
    rows = num_perm // bands
    thr = int(new_rate * SAMPLE_DENOM)
    mins = ",\n         ".join(
        f"min((h*{MINHASH_A(i)} + {MINHASH_B(i)}) % {POLY_P}) AS m{i}"
        for i in range(num_perm)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS bh FROM sig".format(
            band=bi,
            key=", ',', ".join(f"m{bi * rows + r}" for r in range(rows)),
        )
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_perm)
    )
    return rf"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text, lang,
         CASE WHEN {_sample_bucket_sql('doc_id', salt)} < {thr} THEN 1 ELSE 0 END AS isnew
  FROM documents
),
nrm AS (SELECT doc_id, isnew, {NORM} AS norm FROM base),
cnorm AS (SELECT DISTINCT norm FROM nrm WHERE isnew = 0),
new1 AS MATERIALIZED (
  SELECT doc_id FROM nrm
  WHERE isnew = 1 AND norm NOT IN (SELECT norm FROM cnorm)
),
pool AS MATERIALIZED (
  SELECT b.doc_id, b.text, b.isnew FROM base b
  WHERE b.isnew = 0 OR b.doc_id IN (SELECT doc_id FROM new1)
),
t AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM pool
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS shingle
  FROM t, unnest(list_transform(
        range(1, greatest(len(toks) - {k}, 0) + 2),
        i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {k}
),
hs AS MATERIALIZED (
  SELECT doc_id, {_poly('shingle')} AS h FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
),
banded AS MATERIALIZED (
  {band_selects}
),
bsz AS (SELECT band, bh, count(*) AS bs FROM banded GROUP BY 1, 2),
b2 AS MATERIALIZED (
  SELECT banded.* FROM banded JOIN bsz USING (band, bh)
  WHERE bs <= {max_bucket_size}
),
matched AS (
  SELECT DISTINCT x.doc_id AS nid
  FROM b2 x JOIN b2 y USING (band, bh)
  JOIN pool px ON x.doc_id = px.doc_id
  JOIN pool py ON y.doc_id = py.doc_id
  JOIN sig sa ON x.doc_id = sa.doc_id
  JOIN sig sb ON y.doc_id = sb.doc_id
  WHERE px.isnew = 1 AND py.isnew = 0
    AND ({matches}) / {float(num_perm)} >= {threshold}
)
SELECT b.doc_id, b.lang FROM base b
WHERE b.doc_id IN (SELECT doc_id FROM new1)
  AND b.doc_id NOT IN (SELECT nid FROM matched)
"""


def docs_hashed_tfidf_sql(dim: int) -> str:
    """doc_id, bucket, w — twin of operators.vectorize.hashed_tfidf,
    compared on the NONZERO CELLS (the driver query posexplodes the
    assembled vector and drops zeros, so this also validates assembly
    positions). Same tokenization, same smoothed idf, same portable-hash
    bucketing; ln() differs across engines by at most an ulp, far under
    the 8-dp rounding."""
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest({TOKS}) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
feat AS (
  SELECT doc_id,
         CAST({_poly('tok')} % {dim} AS INT) AS bucket,
         tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0) AS w
  FROM tf JOIN dfreq USING (tok), n
)
SELECT doc_id, bucket, round(sum(w), 8) AS w
FROM feat GROUP BY doc_id, bucket
"""


def docs_lm_score_sql(k: float = 0.5) -> str:
    """doc_id, n_tok, avg_logp, bits_per_token — twin of
    operators.lm.unigram_lm_scores in self-training mode (LM trained on
    the full corpus, so every scored token is in-vocabulary and the
    OOV/left-join branch is exercised only by pytest). Same tokenizer
    (TOKS), same add-k formula, floats rounded to 6 on both sides."""
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM cf),
sc AS (
  SELECT tf.doc_id,
         sum(tf) AS n_tok,
         sum(tf * ln((cf + {k}) / (t + {k} * (v + 1.0)))) / sum(tf) AS avg_logp
  FROM tf JOIN cf USING (token) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
       round(coalesce(sc.avg_logp, 0.0), 6) AS avg_logp,
       round(-coalesce(sc.avg_logp, 0.0) / ln(2), 6) AS bits_per_token
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


def docs_pmi_pairs_sql(window: int = 2, min_count: int = 5) -> str:
    """a, b, pair_count, pmi — twin of operators.cooccur.pmi_pairs: same
    tokenizer (TOKS), same symmetric-window directed counts (each (x, y)
    event feeds both n(x→y) and n(y→x); diagonal counts twice), same
    PMI = ln(n·N / (m_a·m_b)) rounded to 6. DuckDB range(1, n) is
    end-exclusive, so offset j pairs index i = 1..len−j via
    range(1, len−j+1) — the BPE twin's convention."""
    terms = "\n  UNION ALL\n".join(
        f"""  SELECT u.p.x AS x, u.p.y AS y
  FROM cs, unnest(list_transform(range(1, len(c) + 1 - {j}),
       i -> struct_pack(x := c[i], y := c[i + {j}]))) AS u(p)"""
        for j in range(1, window + 1)
    )
    return rf"""
WITH cs AS MATERIALIZED (
  SELECT {TOKS} AS c FROM documents
),
ev AS MATERIALIZED (
{terms}
),
dir AS MATERIALIZED (
  SELECT x AS a, y AS b FROM ev
  UNION ALL
  SELECT y AS a, x AS b FROM ev
),
nd AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS pair_count FROM dir GROUP BY a, b
),
marg AS (SELECT a, sum(pair_count) AS m FROM nd GROUP BY a),
tot AS (SELECT CAST(sum(pair_count) AS DOUBLE) AS n_tot FROM nd)
SELECT nd.a, nd.b, nd.pair_count,
       round(ln(pair_count * n_tot / (ma.m * mb.m)), 6) AS pmi
FROM nd
JOIN marg ma ON nd.a = ma.a
JOIN marg mb ON nd.b = mb.a
CROSS JOIN tot
WHERE nd.a <= nd.b AND nd.pair_count >= {min_count}
"""


def docs_corpus_profile_sql() -> str:
    """source, n_docs, total_tokens, avg_chars, p50_tok, p90_tok, p99_tok
    — twin of operators.quality.corpus_profile(exact=True): same
    tokenizer (TOKS) for counts, quantile_cont ⇄ Spark percentile (both
    type-7 linear interpolation on the sorted values)."""
    return rf"""
WITH per_doc AS (
  SELECT source, length(text) AS n_chars, len({TOKS}) AS n_tok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_chars), 6) AS avg_chars,
       round(quantile_cont(n_tok, 0.5), 6) AS p50_tok,
       round(quantile_cont(n_tok, 0.9), 6) AS p90_tok,
       round(quantile_cont(n_tok, 0.99), 6) AS p99_tok
FROM per_doc GROUP BY source
"""


def docs_mix_weights_sql(
    alpha: float = 0.7, token_budget: int = 1_000_000, round_to: int = 8
) -> str:
    """source, n_docs, total_tokens, natural_share, weight, epochs —
    twin of operators.sampling.source_mix_weights: α-smoothed multinomial
    mixing weights p_s = tokens_s^α / Σ tokens_t^α and epochs-per-source
    under a token budget; same tokenizer (TOKS)."""
    return rf"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({TOKS})) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(total_tokens) AS DOUBLE) AS grand,
         sum(pow(CAST(total_tokens AS DOUBLE), {alpha})) AS z
  FROM per_src
)
SELECT source, n_docs, total_tokens,
       round(total_tokens / grand, {round_to}) AS natural_share,
       round(pow(CAST(total_tokens AS DOUBLE), {alpha}) / z, {round_to}) AS weight,
       round({float(token_budget)} * (pow(CAST(total_tokens AS DOUBLE), {alpha}) / z)
             / total_tokens, {round_to}) AS epochs
FROM per_src CROSS JOIN tot
"""


def emb_pca_top_sql(iters: int = 3, round_to: int = 6) -> str:
    """pos, loading — twin of operators.pca.pca_top_component
    (method='explode'): population covariance via an el⋈el self-join on
    vec_id, then ``iters`` unrolled power-iteration steps from
    x0 = 1/√d with L2 normalization per step (identical arithmetic,
    identical positive start → identical sign)."""
    steps = []
    for t in range(1, iters + 1):
        p = f"x{t - 1}"
        steps.append(f"""
y{t} AS MATERIALIZED (
  SELECT c.i AS pos, sum(c.cov * x.xv) AS yv
  FROM cov c JOIN {p} x ON c.j = x.pos GROUP BY c.i
),
nrm{t} AS (SELECT sqrt(sum(yv * yv)) AS nrm FROM y{t}),
x{t} AS MATERIALIZED (SELECT pos, yv / nrm AS xv FROM y{t}, nrm{t})""")
    body = ",\n".join(steps)
    return rf"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
el AS MATERIALIZED (
  -- CAST to INTEGER: Spark's posexplode pos is int32 and the driver's
  -- value hash is byte-sensitive to width (sessionize_sql precedent)
  SELECT vec_id, CAST(u.s.p - 1 AS INTEGER) AS p, u.s.x AS x
  FROM v, unnest(list_transform(range(1, len(e) + 1),
       k -> struct_pack(p := k, x := e[k]))) AS u(s)
),
cov AS MATERIALIZED (
  SELECT a.p AS i, b.p AS j,
         sum(a.x * b.x) / nn.n - (sum(a.x) / nn.n) * (sum(b.x) / nn.n) AS cov
  FROM el a JOIN el b USING (vec_id) CROSS JOIN nn
  GROUP BY a.p, b.p, nn.n
),
dd AS (SELECT CAST(max(i) + 1 AS DOUBLE) AS d FROM cov),
x0 AS MATERIALIZED (SELECT DISTINCT i AS pos, 1.0 / sqrt(d) AS xv FROM cov, dd),
{body}
SELECT pos, round(xv, {round_to}) AS loading FROM x{iters}
"""


def docs_chunks_sql(
    chunk_tokens: int = 128, overlap: int = 0, min_tokens: int = 1
) -> str:
    """doc_id, chunk_idx, n_tok, chunk_text — twin of
    operators.sampling.chunk_documents: same tokenizer (TOKS), same
    sliding window (stride = chunk_tokens − overlap, chunks start while
    inside the document, short tails kept if ≥ min_tokens), token-space
    reassembly with single spaces. list_slice clamps past the end like
    Spark's slice; INTEGER casts mirror Spark's int32 sequence/size."""
    stride = chunk_tokens - overlap
    return rf"""
WITH cs AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS c, len({TOKS}) AS n FROM documents
),
ch AS (
  SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
         list_slice(c, u.i * {stride} + 1, u.i * {stride} + {chunk_tokens}) AS chunk
  FROM cs, unnest(range(0, CASE WHEN n <= 0 THEN 0 ELSE (n - 1) // {stride} + 1 END)) AS u(i)
)
SELECT doc_id, chunk_idx, CAST(len(chunk) AS INTEGER) AS n_tok,
       array_to_string(chunk, ' ') AS chunk_text
FROM ch WHERE len(chunk) >= {min_tokens}
"""


def emb_quantize_sql(round_to: int = 8) -> str:
    """vec_id, scale, mse, linf — twin of
    operators.vectorize.quantize_embeddings: int8 symmetric scalar
    quantization (scale = max|x|/127, q = floor(x/scale + 0.5) —
    explicit half-up so both engines round identically), reconstruction
    error stats; all-zero vectors short-circuit to zeros via the same
    CASE guard."""
    return rf"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
s AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
),
err AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0 THEN list_transform(e, x -> 0.0)
              ELSE list_transform(e, x -> x - floor(x / scale + 0.5) * scale)
         END AS er,
         len(e) AS d
  FROM s
)
SELECT vec_id,
       round(scale, {round_to}) AS scale,
       round(list_sum(list_transform(er, x -> x * x)) / d, {round_to}) AS mse,
       round(list_max(list_transform(er, x -> abs(x))), {round_to}) AS linf
FROM err
"""


def _bpe_train_ctes(n_merges: int) -> list[str]:
    """The BPE-training CTE chain (wf, w0, then p{i}/t{i}/w{i} per
    merge) shared by the training twin (docs_bpe_merges_sql) and the
    encoding twin (docs_bpe_encode_sql, which nests the full training
    so its merge rules are the ones Spark trains on the same corpus)."""
    steps = [
        f"""wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({TOKS}) AS word FROM documents) GROUP BY word
),
w0 AS MATERIALIZED (
  SELECT array_to_string(list_filter(string_split(word, ''), c -> c <> ''), ' ') AS w,
         freq
  FROM wf
)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        steps.append(f"""
p{i} AS MATERIALIZED (
  SELECT u.p.l AS "left", u.p.r AS "right", CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT string_split(w, ' ') AS s, freq FROM w{p}),
       unnest(list_transform(range(1, len(s)),
              j -> struct_pack(l := s[j], r := s[j+1]))) AS u(p)
  GROUP BY 1, 2
),
t{i} AS MATERIALIZED (
  SELECT "left", "right", pair_count FROM p{i}
  ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT list_reduce(
    list_prepend('', string_split(w, ' ')),
    (acc, x) -> CASE
      WHEN acc = '' THEN x
      WHEN list_extract(string_split(acc, ' '), len(string_split(acc, ' '))) = t."left"
           AND x = t."right"
        THEN substr(acc, 1, length(acc) - length(t."left")) || t."left" || t."right"
      ELSE acc || ' ' || x END
  ) AS w, freq
  FROM w{p} CROSS JOIN t{i} t
)""")
    return steps


def docs_bpe_merges_sql(n_merges: int = 8) -> str:
    """rank, left, right, pair_count — twin of
    operators.vocab.bpe_train_merges: same word-frequency collapse, same
    adjacent-pair counts, same (count DESC, left, right) winner, same
    greedy-leftmost fold (list_reduce with a ''-prepended accumulator —
    validated to reproduce canonical BPE merge semantics: 'aaa' under
    (a,a) → 'aa a'). Rounds where every word is a single symbol emit no
    row, exactly like the Spark loop."""
    body = ",\n".join(_bpe_train_ctes(n_merges))
    union = "\nUNION ALL\n".join(
        f'SELECT CAST({i} AS INT) AS rank, "left", "right", pair_count FROM t{i}'
        for i in range(1, n_merges + 1)
    )
    return f"WITH {body}\n{union}"


def docs_bpe_encode_sql(n_merges: int = 4) -> str:
    """doc_id, n_tokens, n_subwords, subword_text — twin of
    operators.vocab.bpe_encode applied to merges freshly trained by
    bpe_train_merges on the same corpus: the training CTE chain is
    nested verbatim (_bpe_train_ctes), then each DISTINCT word is
    symbolized and folded through t1..tN in rank order with the same
    greedy-leftmost list_reduce as training, and documents are
    reassembled by joining each (doc, pos, word) to its encoding and
    string_agg'ing in token order — byte-exact subword_text parity.
    Token-less documents survive with (0, 0, '')."""
    steps = _bpe_train_ctes(n_merges)
    steps.append("""
e0 AS MATERIALIZED (
  SELECT word,
         array_to_string(list_filter(string_split(word, ''), c -> c <> ''), ' ') AS w
  FROM (SELECT DISTINCT word FROM (SELECT unnest({toks}) AS word FROM documents))
)""".replace("{toks}", TOKS))
    for i in range(1, n_merges + 1):
        p = i - 1
        steps.append(f"""
e{i} AS MATERIALIZED (
  SELECT word, list_reduce(
    list_prepend('', string_split(w, ' ')),
    (acc, x) -> CASE
      WHEN acc = '' THEN x
      WHEN list_extract(string_split(acc, ' '), len(string_split(acc, ' '))) = t."left"
           AND x = t."right"
        THEN substr(acc, 1, length(acc) - length(t."left")) || t."left" || t."right"
      ELSE acc || ' ' || x END
  ) AS w
  FROM e{p} CROSS JOIN t{i} t
)""")
    steps.append(f"""
tok AS MATERIALIZED (
  SELECT doc_id, u.t.pos AS pos, u.t.word AS word
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents),
       unnest(list_transform(range(1, len(toks) + 1),
              j -> struct_pack(pos := j, word := toks[j]))) AS u(t)
)""")
    steps.append(f"""
agg AS (
  SELECT tok.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(len(string_split(e.w, ' '))) AS BIGINT) AS n_subwords,
         string_agg(e.w, ' ' ORDER BY tok.pos) AS subword_text
  FROM tok JOIN e{n_merges} e USING (word)
  GROUP BY tok.doc_id
)""")
    body = ",\n".join(steps)
    return f"""WITH {body}
SELECT d.doc_id,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.n_subwords, 0) AS n_subwords,
       coalesce(a.subword_text, '') AS subword_text
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg a USING (doc_id)"""


def emb_quantized_topk_sql(query_ids: list[int], k: int = 10) -> str:
    """query_id, neighbor_id, qcosine, rank — twin of
    operators.similarity.cosine_topk_quantized: same int8 quantization
    (scale = max|x|/127, q = floor(x/scale + 0.5) — explicit half-up),
    int dot / int norms are EXACT integers on both engines, one division
    + two sqrt of exact ints → hash-stable floats; ties broken
    (qcosine DESC, neighbor_id ASC)."""
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
s AS MATERIALIZED (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v
),
q AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
         END AS q
  FROM s
),
n AS MATERIALIZED (
  SELECT vec_id, q,
         sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
  FROM q
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(a.q) + 1),
              i -> a.q[i] * b.q[i])) AS DOUBLE)
           / (greatest(a.nrm, 1e-12) * greatest(b.nrm, 1e-12)) AS qc
  FROM n a JOIN n b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN ({qlist})
),
ranked AS (
  SELECT query_id, neighbor_id, qc,
         row_number() OVER (PARTITION BY query_id ORDER BY round(qc, 8) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(qc, 8) AS qcosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def docs_ngram_containment_sql(
    k: int = 3, threshold: float = 0.8, max_shingle_freq: int = 1000
) -> str:
    """a, b, containment — twin of
    operators.dedup.ngram_containment_pairs: |S(a)∩S(b)| / |S(a)| over
    the same distinct-shingle sets, same skew cap, ORDERED pairs a ≠ b."""
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS shingle
  FROM t, unnest(list_transform(
        range(1, greatest(len(toks) - {k}, 0) + 2),
        i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS u(s)
  WHERE len(string_split(s, ' ')) = {k}
),
sh AS MATERIALIZED (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_shingle_freq}
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(common * 1.0 / sa.n_sh, 8) AS containment
FROM common JOIN sizes sa ON common.a = sa.doc_id
WHERE common * 1.0 / sa.n_sh >= {threshold}
"""


def docs_gopher_flags_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> str:
    """Twin of operators.quality.gopher_quality_flags — every
    intermediate statistic AND every boolean, same regexes (common
    Java-regex/RE2 subset, the PII-twin convention)."""
    from pagerank_optimization_spark.functions.text import STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS["en"]))
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text, {TOKS} AS toks,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS lines
  FROM documents
),
s AS (
  SELECT doc_id,
         len(toks) AS n_words,
         length(regexp_replace(lower(text), '\s+', '', 'g'))
           / greatest(len(toks), 1) AS mwl,
         (length(text) - length(regexp_replace(text, '[#…]', '', 'g')))
           / greatest(len(toks), 1) AS sym_ratio,
         len(list_filter(lines, l -> regexp_matches(l, '^\s*([-*•]|\d+[.)])')))
           / greatest(len(lines), 1) AS bullet_frac,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
           / greatest(len(lines), 1) AS ellipsis_frac,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           / greatest(len(toks), 1) AS alpha_frac,
         len(list_intersect(list_distinct(toks), [{stop_list}])) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(sym_ratio, 6) AS symbol_word_ratio,
       round(bullet_frac, 6) AS bullet_line_frac,
       round(ellipsis_frac, 6) AS ellipsis_line_frac,
       round(alpha_frac, 6) AS alpha_word_frac,
       CAST(stop_hits AS INTEGER) AS stopword_hits,
       n_words >= {min_words} AND n_words <= {max_words} AS pass_words,
       mwl >= {min_mean_word_len} AND mwl <= {max_mean_word_len} AS pass_word_len,
       sym_ratio <= {max_symbol_word_ratio} AS pass_symbol,
       bullet_frac <= {max_bullet_frac} AS pass_bullets,
       ellipsis_frac <= {max_ellipsis_frac} AS pass_ellipsis,
       alpha_frac >= {min_alpha_word_frac} AS pass_alpha,
       stop_hits >= {min_stopword_hits} AS pass_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words})
         AND (mwl >= {min_mean_word_len} AND mwl <= {max_mean_word_len})
         AND sym_ratio <= {max_symbol_word_ratio}
         AND bullet_frac <= {max_bullet_frac}
         AND ellipsis_frac <= {max_ellipsis_frac}
         AND alpha_frac >= {min_alpha_word_frac}
         AND stop_hits >= {min_stopword_hits} AS pass_all
FROM s
"""


def docs_substring_spans_sql(
    k: int = 5, min_match_tokens: int = 10, max_gram_freq: int = 1000
) -> str:
    """a, b, a_start, b_start, match_tokens — twin of
    operators.dedup.substring_dup_spans: same positional k-grams, same
    occurrence cap, same a < b gram join, same gaps-and-islands
    (pa − row_number on each (a, b, d) diagonal) run detection.
    All-integer output → hash-exact."""
    min_run = min_match_tokens - k + 1
    return f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
g0 AS MATERIALIZED (
  -- positions unnested first, gram sliced in the outer select: DuckDB's
  -- binder rejects list_slice(outer_col, lambda_var, ...) inside a
  -- struct_pack lambda ("Need named argument for struct pack")
  SELECT doc_id, pos, gram FROM (
    SELECT doc_id, u.pos AS pos,
           array_to_string(list_slice(toks, u.pos, u.pos + {k} - 1), ' ') AS gram
    FROM tk, unnest(range(1, greatest(len(toks) - {k} + 1, 1) + 1)) AS u(pos)
  ) WHERE len(string_split(gram, ' ')) = {k}
),
freq AS MATERIALIZED (
  SELECT gram, count(*) AS occ FROM g0 GROUP BY gram
),
g AS MATERIALIZED (
  SELECT g0.doc_id, g0.pos, g0.gram
  FROM g0 JOIN freq USING (gram) WHERE freq.occ <= {max_gram_freq}
),
m AS (
  SELECT a.doc_id AS a, b.doc_id AS b, a.pos AS pa, b.pos AS pb,
         a.pos - b.pos AS d
  FROM g a JOIN g b USING (gram)
  WHERE a.doc_id < b.doc_id
),
isl AS (
  SELECT a, b, d, pa, pb,
         pa - row_number() OVER (PARTITION BY a, b, d ORDER BY pa) AS isl
  FROM m
),
runs AS (
  SELECT a, b,
         CAST(count(*) AS BIGINT) AS run_len,
         CAST(min(pa) AS BIGINT) AS a_start,
         CAST(min(pb) AS BIGINT) AS b_start
  FROM isl GROUP BY a, b, d, isl
  HAVING count(*) >= {min_run}
)
SELECT a, b, a_start, b_start, CAST(run_len + {k - 1} AS BIGINT) AS match_tokens
FROM runs
"""


def docs_winnow_sql(k: int = 7, w: int = 8, where: str = "TRUE") -> str:
    """doc_id, pos, gram_hash — twin of operators.dedup.winnow_fingerprints
    (all-argmin winnowing over portable poly-hashed char k-grams; the same
    two-window-pass formulation, full windows only, short docs contribute
    their single all-grams window)."""
    return f"""
WITH n AS (
  SELECT doc_id, {NORM} AS norm FROM documents WHERE {where}
),
g AS (
  SELECT doc_id,
         unnest(range(1, greatest(length(norm) - {k - 1}, 1) + 1)) AS pos,
         unnest(list_transform(range(1, greatest(length(norm) - {k - 1}, 1) + 1),
                               i -> {_poly(f"substring(norm, i::INT, {k})")})) AS h
  FROM n
),
m AS (
  SELECT doc_id, pos, h,
         CASE WHEN pos <= greatest(count(*) OVER (PARTITION BY doc_id) - {w - 1}, 1)
              THEN min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
         END AS wmin
  FROM g
)
SELECT doc_id, CAST(pos AS INT) AS pos, h AS gram_hash
FROM (
  SELECT doc_id, pos, h,
         max(wmin) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS sel
  FROM m
) q
WHERE sel = h
"""


def docs_winnow_pairs_sql(
    k: int = 7, w: int = 8, min_shared: int = 3, max_gram_freq: int = 1000
) -> str:
    """a, b, n_shared — twin of operators.dedup.winnow_pairs (distinct
    per-doc fingerprint hashes, hot-gram cap, shared-hash self-join)."""
    return f"""
WITH fp0 AS (
  SELECT DISTINCT doc_id AS id, gram_hash AS h
  FROM ({docs_winnow_sql(k=k, w=w)}) wf
),
freq AS (SELECT h, count(*) AS hf FROM fp0 GROUP BY h),
fp AS (
  SELECT fp0.id, fp0.h FROM fp0 JOIN freq USING (h) WHERE freq.hf <= {max_gram_freq}
)
SELECT x.id AS a, y.id AS b, CAST(count(*) AS BIGINT) AS n_shared
FROM fp x JOIN fp y ON x.h = y.h AND x.id < y.id
GROUP BY x.id, y.id
HAVING count(*) >= {min_shared}
"""


def docs_zipf_fit_sql(top_n: int = 1000, skip_ranks: int = 0, round_to: int = 6) -> str:
    """slope, intercept, tokens_fit — twin of operators.vocab.zipf_fit:
    the same deterministic top-N cut as docs_vocab_topk_sql, then the
    closed-form OLS sums over ln(rank)/ln(cf)."""
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
vs AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cf
  FROM toks GROUP BY token
),
top AS (
  SELECT cf,
         CAST(row_number() OVER (ORDER BY cf DESC, token ASC) AS INT) AS rank
  FROM vs ORDER BY cf DESC, token ASC LIMIT {top_n}
),
pts AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cf AS DOUBLE)) AS y
  FROM top WHERE rank > {skip_ranks}
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), {round_to}) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, {round_to}) AS intercept,
       n AS tokens_fit
FROM s
"""


def docs_textrank_sql(
    window: int = 2, min_count: int = 3, k0: int = 10, round_to: int = 8
) -> str:
    """token, pr — twin of operators.textrank.textrank_keywords: the PMI
    twin's window-event CTEs build the symmetric token graph (directed
    pairs both ways, count >= min_count, a <> b, deduped to 0/1 edges),
    then the SHARED PageRank unroll (oracle_sql.pagerank_unroll_steps —
    the same CTE chain the transcript-graph twin runs) iterates k0 steps
    over CTEs named vertices/edges/outdeg."""
    from pagerank_optimization_spark.plans.oracle_sql import pagerank_unroll_steps

    terms = "\n  UNION ALL\n".join(
        f"""  SELECT u.p.x AS x, u.p.y AS y
  FROM cs, unnest(list_transform(range(1, len(c) + 1 - {j}),
       i -> struct_pack(x := c[i], y := c[i + {j}]))) AS u(p)"""
        for j in range(1, window + 1)
    )
    return rf"""
WITH cs AS MATERIALIZED (
  SELECT {TOKS} AS c FROM documents
),
ev AS MATERIALIZED (
{terms}
),
dir AS MATERIALIZED (
  SELECT x AS a, y AS b FROM ev
  UNION ALL
  SELECT y AS a, x AS b FROM ev
),
nd AS MATERIALIZED (
  SELECT a, b, count(*) AS pair_count FROM dir GROUP BY a, b
),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM nd
  WHERE a <> b AND pair_count >= {min_count}
),
vertices AS MATERIALIZED (
  SELECT src AS entity FROM edges UNION SELECT dst FROM edges
),
outdeg AS MATERIALIZED (
  SELECT src AS entity, count(*) AS outdeg FROM edges GROUP BY src
),
{pagerank_unroll_steps(k0)}
SELECT entity AS token, round(pr, {round_to}) AS pr FROM r{k0}
"""


def docs_source_jsd_sql(round_to: int = 8) -> str:
    """source, n_tokens, jsd — twin of operators.quality.source_divergence:
    per-source Jensen–Shannon divergence vs the corpus mix, with the
    absent-token mass folded into the closed form 0.5·ln2·(1 − Σ q)."""
    return rf"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS token FROM documents
),
st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY source, token
),
tt AS (SELECT token, sum(cnt) AS tcnt FROM st GROUP BY token),
stot AS (SELECT source, sum(cnt) AS scnt FROM st GROUP BY source),
ct AS (SELECT sum(cnt) AS ctot FROM st),
terms AS (
  SELECT s.source,
         so.scnt,
         (CAST(s.cnt AS DOUBLE) / so.scnt) AS p,
         (CAST(t.tcnt AS DOUBLE) / (SELECT ctot FROM ct)) AS q
  FROM st s
  JOIN tt t ON s.token = t.token
  JOIN stot so ON s.source = so.source
)
SELECT source,
       CAST(max(scnt) AS BIGINT) AS n_tokens,
       round(sum(0.5 * (p * ln(2 * p / (p + q)) + q * ln(2 * q / (p + q))))
             + 0.5 * ln(2) * (1 - sum(q)), {round_to}) AS jsd
FROM terms
GROUP BY source
"""


def docs_heaps_fit_sql(min_tokens: int = 100, round_to: int = 6) -> str:
    """slope, intercept, docs_fit — twin of operators.vocab.heaps_fit:
    the vocabulary-growth curve (cumulative tokens vs cumulative distinct
    tokens in doc_id order) and the closed-form OLS over its log-log
    points above the min_tokens cut."""
    return rf"""
WITH per_doc AS (
  SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tok FROM documents
),
firsts AS (
  SELECT token, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest({TOKS}) AS token FROM documents) t
  GROUP BY token
),
new_per_doc AS (
  SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS new_tok
  FROM firsts GROUP BY first_doc
),
curve AS (
  SELECT sum(p.n_tok) OVER w AS cum_tok,
         sum(coalesce(n.new_tok, 0)) OVER w AS cum_vocab
  FROM per_doc p LEFT JOIN new_per_doc n ON p.doc_id = n.doc_id
  WINDOW w AS (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
),
pts AS (
  SELECT ln(CAST(cum_tok AS DOUBLE)) AS x, ln(CAST(cum_vocab AS DOUBLE)) AS y
  FROM curve WHERE cum_tok >= {min_tokens} AND cum_vocab > 0
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), {round_to}) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, {round_to}) AS intercept,
       n AS docs_fit
FROM s
"""
