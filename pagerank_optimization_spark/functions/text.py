"""Text-analysis column functions for training-data pipelines over the
``documents`` table — all pure ``pyspark.sql.functions`` compositions
(JVM-side, whole-stage-codegen'd; no Python in the hot path).

These extend the engine beyond the reference's numeric kernel: a 100 TB
transcript/document corpus needs language ID, quality scoring, token
counting and fingerprinting as first-class scan-side operators
(filter-pushdown-friendly projections, not UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword inventories per language (heuristic n-gram/
# stopword language ID — no external models; adequate for routing + tests)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "por", "con"],
}


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization (array<string>), empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(text))


def subword_count_expr(text: Column) -> Column:
    """BPE-ish subword count: alphanumeric runs + standalone punctuation,
    long words weighted by ceil(len/4) (a cheap, deterministic proxy for
    byte-pair token counts — good enough for budget/length filtering)."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("int"),
    )


def stopword_ratio_expr(text: Column, lang: str = "en") -> Column:
    toks = tokens_expr(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio_expr(text: Column) -> Column:
    total = F.greatest(F.length(text), F.lit(1))
    nonpunct = F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (total - nonpunct) / total


def mean_word_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total_chars / F.greatest(F.size(toks), F.lit(1))


def quality_score_expr(text: Column) -> Column:
    """Deterministic document quality heuristic in [0, 1]: rewards
    reasonable length, normal word lengths, some stopwords, low punctuation
    noise — the standard cheap pre-filter in web-scale corpus cleaning."""
    n_tok = token_count_expr(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    wl = mean_word_len_expr(text)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    sw_score = F.least(stopword_ratio_expr(text) * F.lit(5.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio_expr(text) * F.lit(4.0), F.lit(1.0))
    return F.round(
        F.lit(0.3) * len_score + F.lit(0.2) * wl_score + F.lit(0.3) * sw_score + F.lit(0.2) * punct_score,
        6,
    )


def lang_id_expr(text: Column) -> Column:
    """Argmax of per-language stopword hit ratios; 'und' (undetermined) when
    nothing matches. Total tie-break order: ratio desc, then language code
    asc — deterministic on any input."""
    toks = tokens_expr(text)
    n = F.greatest(F.size(toks), F.lit(1))
    def _ratio_struct(lang: str, sw: list[str]):
        # NB: the filter lambda must be unary — PySpark dispatches a 2-arg
        # lambda as (element, index)
        return F.struct(
            (F.size(F.filter(toks, lambda t: t.isin(*sw))) / n).alias("ratio"),
            F.lit(lang).alias("lang"),
        )

    scored = F.array(*[_ratio_struct(lang, sw) for lang, sw in sorted(STOPWORDS.items())])
    # max ratio wins; on ties the lexicographically smallest language code
    max_ratio = F.array_max(F.transform(scored, lambda s: s["ratio"]))
    winners = F.filter(scored, lambda s: s["ratio"] == max_ratio)
    winner = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return F.when(max_ratio <= F.lit(0.0), F.lit("und")).otherwise(winner)


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: 64-bit hash of the casefolded,
    whitespace/punctuation-normalized text. Two documents share a
    fingerprint iff they are near-exact duplicates modulo formatting —
    the cheap first pass before MinHash."""
    normalized = F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")
    return F.xxhash64(F.trim(normalized))


# --- engine-portable hashing -------------------------------------------------
# xxhash64 is the production hash (one JVM intrinsic per value), but no
# other engine reproduces it. The portable polynomial hash below is
# arithmetic-only (h = (h*31 + codepoint) mod P, P prime < 2^50 so every
# intermediate stays < 2^63 under ANSI arithmetic) and is reproduced
# verbatim in the DuckDB oracle twins (plans.oracle_sql_docs) — it makes
# MinHash/SimHash/fingerprint oracle-checkable end to end, mirroring how
# the reference verifies EVERY variant (verify_op.c:196-254).

POLY_P = 1_125_899_906_842_597  # largest prime < 2^50
POLY_H0 = 7


def poly_hash_expr(s: Column) -> Column:
    """Portable polynomial string hash (codegen'd fold over characters).
    Matches plans.oracle_sql_docs.POLY_SQL exactly, including the
    empty-string case (filtered char list → returns H0)."""
    chars = F.filter(F.split(s, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(POLY_H0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(POLY_P),
    )


def portable_fingerprint_expr(text: Column) -> Column:
    """fingerprint_expr with the portable hash — same normalization, same
    equality classes (modulo hash width), DuckDB-oracle-checkable."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return poly_hash_expr(normalized)
