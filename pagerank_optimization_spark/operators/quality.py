"""Corpus-quality operators for training-data curation: repetition
stats, per-source caps, and benchmark decontamination.

These are the three standard curation passes a web-scale corpus gets
after dedup (all public practice — Gopher's repetition filters,
per-domain caps in CCNet/C4, and benchmark n-gram decontamination in
GPT-3/PaLM appendices):

1. ``repetition_stats`` — per-document duplicate-line fraction and
   top-n-gram mass (documents that repeat themselves are boilerplate or
   spam; Rae et al. 2021 §A1.3 filter on exactly these).
2. ``source_cap`` — keep at most N best-quality documents per source /
   domain, so one crawler-friendly site cannot dominate the corpus mix.
3. ``contamination_flags`` — flag corpus documents sharing any word
   k-gram with a benchmark set, the standard eval-decontamination move.

Scale notes (100 TB lens):
- repetition_stats is one explode + two doc-keyed aggregations — linear,
  map-side-combinable, no cross-document join at all.
- source_cap does NOT run one global sort per source (a hot domain with
  10^9 docs would funnel through a single window task). It is the
  classic two-stage salted top-N: rank inside (source, salt) buckets,
  keep N candidates per bucket (≤ salt·N rows per source survive — tiny),
  then re-rank the candidates. Identical output, bounded task size.
- contamination_flags broadcasts the benchmark shingle set (benchmarks
  are thousands of docs, not billions) so the corpus-side pass is a
  broadcast semi-join — zero shuffle of the 100 TB side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import quality_score_expr, tokens_expr


def _lines_expr(text: Column) -> Column:
    """Non-blank trimmed lines (array<string>)."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def _grams_all(text: Column, n: int) -> Column:
    """ALL word n-gram occurrences (array<string>, duplicates kept) — the
    multiset dedup.shingles() collapses with distinct(); repetition mass
    needs the multiplicities."""
    toks = tokens_expr(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.filter(grams, lambda g: F.size(F.split(g, " ")) == n)


def repetition_stats(
    documents: DataFrame,
    *,
    ngram_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_lines, dup_line_frac, total_grams, top_ngram_frac).

    ``dup_line_frac``: fraction of non-blank lines that are repeats of
    another line in the same document (1 − distinct/total) — computed
    entirely inside one codegen'd expression, no explode.
    ``top_ngram_frac``: fraction of the document's n-gram occurrences
    claimed by its single most frequent n-gram (Gopher-style "top 2-gram
    mass"). This one needs per-gram multiplicities, so it is an explode
    + groupBy(doc, gram) + groupBy(doc) — both doc-keyed, both
    map-side-combinable, linear in corpus size.
    Fractions are rounded to 8 dp (float-portable vs the DuckDB twin)."""
    lines = _lines_expr(F.col(text_col))
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.greatest(F.size(lines), F.lit(1)),
            8,
        ).alias("dup_line_frac"),
    )
    per_gram = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_grams_all(F.col(text_col), ngram_n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    gram_agg = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("total_grams"), F.max("cnt").alias("max_cnt")
    )
    return (
        base.join(gram_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.coalesce(F.col("total_grams"), F.lit(0)).alias("total_grams"),
            F.round(
                F.coalesce(
                    F.col("max_cnt") / F.col("total_grams").cast("double"), F.lit(0.0)
                ),
                8,
            ).alias("top_ngram_frac"),
        )
    )


def source_cap(
    documents: DataFrame,
    n_per_source: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep the ``n_per_source`` best-quality documents per source →
    (doc_id, source, score, rank). Order: quality score (already rounded
    to 6 dp inside quality_score_expr — the cross-engine-stable key)
    descending, doc_id ascending as the deterministic tiebreak.

    Two-stage salted top-N: a naive window over ``source`` sorts every
    document of a hot domain in ONE task; here stage 1 ranks inside
    (source, hash(id) % salt_buckets) and keeps only candidates that can
    still make the global top-N (rank ≤ N per bucket ⇒ ≤ salt_buckets·N
    survivors per source), stage 2 re-ranks the survivors. The candidate
    set provably contains the true top-N (any row outside it is beaten
    by ≥ N rows in its own bucket alone)."""
    if n_per_source <= 0:
        raise ValueError(f"source_cap: n_per_source must be positive, got {n_per_source}")
    scored = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        quality_score_expr(F.col(text_col)).alias("score"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets)).alias(
            "_salt"
        ),
    )
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    w1 = W.partitionBy("source", "_salt").orderBy(*order)
    candidates = (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n_per_source)
        .drop("_r1", "_salt")
    )
    w2 = W.partitionBy("source").orderBy(*order)
    return (
        candidates.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n_per_source)
        .select("doc_id", "source", "score", "rank")
    )


def contamination_flags(
    documents: DataFrame,
    benchmark: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_hit_shingles): corpus documents sharing ≥1 word
    k-gram with ANY benchmark document, with the count of distinct
    shared k-grams — the standard eval-set decontamination pass
    (GPT-3 appendix C / PaLM style, word-level n-gram collision).

    The benchmark shingle set is deduped and BROADCAST (benchmarks are
    small by definition); the corpus side streams through a broadcast
    hash join — the 100 TB side is never shuffled."""
    from .dedup import shingles

    bench_sh = (
        shingles(benchmark, k=k, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    corpus_sh = shingles(documents, k=k, id_col=id_col, text_col=text_col)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
    )


def _bloom_pos(gram: Column, i: Column, bits: int, salt: str) -> Column:
    """Bit position of hash row ``i`` for ``gram``: portable MD5 H48
    (same family as sampling/count-min, reproduced verbatim in DuckDB)
    mod the filter width."""
    from .walks import _hash48

    h = _hash48(
        F.concat(F.lit(f"{salt}:"), i.cast("string"), F.lit(":"), gram)
    )
    return (h % F.lit(bits)).cast("int")


def bloom_bits(
    benchmark: DataFrame,
    *,
    k: int = 3,
    bits: int = 1 << 20,
    hashes: int = 4,
    salt: str = "bf",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (pos int): the DISTINCT set-bit positions of a Bloom filter
    (Bloom 1970) over the benchmark's distinct word k-grams — ``hashes``
    positions per gram from the portable MD5 family.

    This IS the filter: membership(g) ⇔ all ``hashes`` positions of g
    are present. Representing the bit array as its set-position rows
    keeps everything declarative (no binary blobs) and gives the two
    properties the 100 TB story needs: the table is ≤ min(bits,
    hashes·|grams|) rows whatever the benchmark grows to (state is
    CAPPED by ``bits`` — contamination_flags' broadcast shingle set is
    not), and filters over benchmark SHARDS merge by plain distinct
    union (bitwise OR)."""
    if bits <= 0 or hashes <= 0:
        raise ValueError("bloom_bits: bits and hashes must be positive")
    from .dedup import shingles

    sh = (
        shingles(benchmark, k=k, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    return (
        sh.select(
            F.explode(F.array(*[F.lit(i) for i in range(hashes)])).alias("i"),
            "shingle",
        )
        .select(_bloom_pos(F.col("shingle"), F.col("i"), bits, salt).alias("pos"))
        .distinct()
    )


def bloom_contamination(
    documents: DataFrame,
    benchmark: DataFrame,
    *,
    k: int = 3,
    bits: int = 1 << 20,
    hashes: int = 4,
    salt: str = "bf",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_flagged_shingles): Bloom-filter eval-set
    decontamination — corpus documents with ≥1 distinct word k-gram
    whose EVERY Bloom position is set by the benchmark, with the count
    of such grams. One-sided by construction: a gram the benchmark
    contains always tests positive (NO false negatives — a contaminated
    document is never missed), and a clean gram false-positives w.p.
    ≈ (1 − e^(−hashes·n/bits))^hashes, so the flag set is a slightly
    conservative superset of ``contamination_flags``.

    The 100 TB shape vs the exact pass: the broadcast side is the
    position table — capped at ``bits`` rows (a few MB at 2^20) no
    matter how large the benchmark union grows (exact broadcast of the
    shingle set is unbounded as benchmarks accumulate); the corpus side
    explodes each distinct gram into ``hashes`` probe rows, streams
    through ONE broadcast semi-join (never shuffled by the benchmark),
    and a gram is flagged iff all its probes survive — a doc-keyed,
    map-side-combinable count."""
    positions = bloom_bits(
        benchmark,
        k=k,
        bits=bits,
        hashes=hashes,
        salt=salt,
        id_col=id_col,
        text_col=text_col,
    )
    from .dedup import shingles

    corpus_sh = shingles(documents, k=k, id_col=id_col, text_col=text_col)
    probes = corpus_sh.select(
        "doc_id",
        "shingle",
        F.explode(F.array(*[F.lit(i) for i in range(hashes)])).alias("i"),
    ).select(
        "doc_id",
        "shingle",
        _bloom_pos(F.col("shingle"), F.col("i"), bits, salt).alias("pos"),
    )
    flagged = (
        probes.join(F.broadcast(positions), "pos", "left_semi")
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("n_set"))
        .where(F.col("n_set") == hashes)
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_flagged_shingles")
    )


def dedup_lines(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line_freq: int = 1_000_000,
    counters: dict | None = None,
) -> DataFrame:
    """Corpus-level line dedup (CCNet/C4-style boilerplate removal) →
    (doc_id, text_clean, n_lines_kept, n_lines_dropped).

    A non-blank trimmed line survives only at its FIRST occurrence in the
    corpus (global (doc_id, position) order); every later copy — across
    documents or within one — is dropped. Occurrences are keyed by the
    NORMALIZED line (lowercased, non-alphanumerics collapsed — the repo's
    NORM convention, same as exact_dedup), so case/punctuation variants
    of a boilerplate line collapse, while the surviving document keeps
    its RAW line text. Keys whose corpus frequency exceeds
    ``max_line_freq`` are boilerplate (cookie banners, nav bars) and are
    dropped wholesale, first occurrence included — exactly the CCNet
    move. Documents are re-assembled from their surviving lines in
    original order (empty string if nothing survives).

    Scale shape: NO skewed join anywhere. The keep-first winner of a
    line IS its surviving occurrence, so the operator is exactly two
    map-side-combinable aggregations — groupBy(line).agg(min(struct),
    count) where a 10^9-copy boilerplate line reduces to ≤ P partial
    rows before the shuffle, then a doc-keyed reassembly groupBy bounded
    by document size. ``counters`` (optional dict) receives
    ``boilerplate_lines`` / ``boilerplate_rows`` fire counts."""
    if max_line_freq <= 0:
        raise ValueError("dedup_lines: max_line_freq must be positive")
    lines = _lines_expr(F.col(text_col))
    base = documents.select(
        F.col(id_col).alias("doc_id"), F.size(lines).alias("n_total")
    )
    occ = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(lines).alias("pos", "line"),
    ).withColumn(
        "key",
        F.trim(F.regexp_replace(F.lower(F.col("line")), r"[^a-z0-9]+", " ")),
    )
    win = occ.groupBy("key").agg(
        F.min(F.struct("doc_id", "pos", "line")).alias("w"),
        F.count("*").alias("freq"),
    )
    if counters is not None:
        hot = win.filter(F.col("freq") > max_line_freq).agg(
            F.count("*").alias("n"), F.coalesce(F.sum("freq"), F.lit(0)).alias("rows")
        ).collect()[0]
        counters["boilerplate_lines"] = int(hot["n"])
        counters["boilerplate_rows"] = int(hot["rows"])
    surv = win.filter(F.col("freq") <= max_line_freq).select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.pos").alias("pos"),
        F.col("w.line").alias("line"),
    )
    rec = surv.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count("*").alias("n_lines_kept"),
    )
    return base.join(rec, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
        (F.col("n_total") - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
            "n_lines_dropped"
        ),
    )


def corpus_profile(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    exact: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-``group_col`` corpus profile — the "what am I about to train
    on" report every data-mixing decision starts from: document count,
    token volume, mean char length, and token-count percentiles
    (p50/p90/p99).

    → (source, n_docs, total_tokens, avg_chars, p50_tok, p90_tok,
    p99_tok), one row per group.

    ``exact=True`` (default, oracle mode): `percentile` — linear
    interpolation on the sorted values, the same type-7 quantile DuckDB's
    `quantile_cont` computes, so the twin compares values exactly. Spark's
    exact percentile buffers each group's values in the aggregation
    state, so it is per-group-memory-bound — fine for per-SOURCE groups
    (few, large groups stream through partial aggs ONLY with approx), so
    at 100 TB use ``exact=False``: `approx_percentile` (t-digest-style
    sketch, bounded state, map-side combinable) with the default 10k
    accuracy — the standard exact↔sketch split this repo uses
    (ngram_jaccard↔minhash, reach↔hyperball)."""
    from ..functions.text import token_count_expr

    per_doc = docs.select(
        F.col(group_col).alias("source"),
        F.length(text_col).alias("n_chars"),
        token_count_expr(F.col(text_col)).alias("n_tok"),
    )
    if exact:
        pct = F.percentile("n_tok", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    else:
        pct = F.approx_percentile(
            "n_tok", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
        )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_chars"), round_to).alias("avg_chars"),
            pct.alias("pct"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "avg_chars",
            F.round(F.col("pct")[0].cast("double"), round_to).alias("p50_tok"),
            F.round(F.col("pct")[1].cast("double"), round_to).alias("p90_tok"),
            F.round(F.col("pct")[2].cast("double"), round_to).alias("p99_tok"),
        )
    )


def source_divergence(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 8,
) -> DataFrame:
    """Per-source Jensen–Shannon divergence between the source's unigram
    token distribution P_s and the corpus-wide mix Q — the data-mixing
    outlier screen (Lin 1991): a template-flooded, non-English, or
    machine-generated source shows up as a JSD spike before any model
    ever trains on it. → (source, n_tokens, jsd), jsd in nats ∈ [0, ln 2]
    (0 = indistinguishable from the corpus mix; ln 2 = disjoint support).

    The absent-token mass needs no enumeration: tokens missing from a
    source have p = 0, m = q/2, so their summed contribution collapses to
    the closed form 0.5·ln2·(1 − Σ_{t∈s} q) — the whole statistic is
    computable from the source's OWN (source, token) rows.

    Scale shape: one groupBy(source, token) with map-side combine absorbs
    the corpus (the vocab_topk argument); the token-marginal join runs
    over the |sources|×|vocab| count table, never the corpus; the
    per-source totals broadcast; the grand total rides the plan as a
    broadcast one-row aggregate (zero collects)."""
    toks = docs.select(
        F.col(group_col).alias("source"),
        F.explode(tokens_expr(F.col(text_col))).alias("token"),
    )
    st = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    tt = st.groupBy("token").agg(F.sum("cnt").alias("tcnt"))
    stot = st.groupBy("source").agg(F.sum("cnt").alias("scnt"))
    ctot = stot.agg(F.sum("scnt").alias("ctot"))
    p = F.col("cnt") / F.col("scnt")
    q = F.col("tcnt") / F.col("ctot")
    # present-token JSD term: 0.5·[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    term = F.lit(0.5) * (
        p * F.log(F.lit(2.0) * p / (p + q)) + q * F.log(F.lit(2.0) * q / (p + q))
    )
    ln2 = float(math.log(2.0))
    return (
        st.join(tt, "token")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            F.max("scnt").alias("n_tokens"),
            (F.sum(term) + F.lit(0.5 * ln2) * (F.lit(1.0) - F.sum(q))).alias("raw"),
        )
        .select("source", "n_tokens", F.round("raw", round_to).alias("jsd"))
    )


def gopher_quality_flags(
    docs: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher static quality-rule battery (Rae et al. 2021, app. A1.1)
    as one pass of pure codegen expressions — the standard pre-training
    document filter. → one row per doc:

    (doc_id, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stopword_hits,
    pass_words, pass_word_len, pass_symbol, pass_bullets, pass_ellipsis,
    pass_alpha, pass_stopwords, pass_all)

    Rule set (defaults = the published thresholds): word count in
    [50, 100k]; mean word length in [3, 10]; (# of '#' or '…')/words
    ≤ 0.1; ≤ 90% of lines starting with a bullet; ≤ 30% of lines ending
    with an ellipsis; ≥ 80% of words containing ≥ 1 alphabetic char;
    ≥ 2 distinct English stopword hits. The repetition half of Gopher's
    filter battery is operators.quality.repetition_stats.

    Scale shape: zero shuffles, zero Python — composes with the scan
    like the other per-doc quality expressions (the twin compares every
    intermediate statistic, not just the booleans)."""
    from ..functions.text import STOPWORDS, mean_word_len_expr, tokens_expr

    text = F.col(text_col)
    toks = tokens_expr(text)
    n_words = F.size(toks)
    mwl = mean_word_len_expr(text)
    n_symbols = F.length(text) - F.length(F.regexp_replace(text, r"[#…]", ""))
    sym_ratio = n_symbols / F.greatest(n_words, F.lit(1))
    lines = _lines_expr(text)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*([-*•]|\d+[.)])")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike(r"[a-z]")))
        / F.greatest(n_words, F.lit(1))
    )
    stop_lit = F.array(*[F.lit(w) for w in sorted(STOPWORDS["en"])])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_lit))

    flags = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("pass_words"),
        ((mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)).alias("pass_word_len"),
        (sym_ratio <= max_symbol_word_ratio).alias("pass_symbol"),
        (bullet_frac <= max_bullet_frac).alias("pass_bullets"),
        (ellipsis_frac <= max_ellipsis_frac).alias("pass_ellipsis"),
        (alpha_frac >= min_alpha_word_frac).alias("pass_alpha"),
        (stop_hits >= min_stopword_hits).alias("pass_stopwords"),
    )
    return flags.withColumn(
        "pass_all",
        F.col("pass_words")
        & F.col("pass_word_len")
        & F.col("pass_symbol")
        & F.col("pass_bullets")
        & F.col("pass_ellipsis")
        & F.col("pass_alpha")
        & F.col("pass_stopwords"),
    )
