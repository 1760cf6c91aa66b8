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

TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
NORM = r"trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


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
