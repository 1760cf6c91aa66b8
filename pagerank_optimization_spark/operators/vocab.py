"""Vocabulary statistics for tokenizer training: corpus-wide token
collection frequency (cf) and document frequency (df) top-N, and BPE
merge-candidate pair counts.

Training a tokenizer (BPE/unigram) over a 100 TB corpus starts from
exactly this table — the token histogram — and corpus audits read the
same stats (head tokens, vocabulary growth, df/cf ratios for stopword
discovery). The reference engine has no text surface; this extends the
engine the same way BM25 (operators/retrieval.py) does, sharing its
tokenization (functions.text.tokens_expr) so vocab rows are consistent
with every other text operator.

Scale notes (100 TB lens):
- The token histogram is the textbook skewed aggregation ("the" carries
  ~5% of all occurrences), but both aggregates are map-side-combinable:
  ``count(*)`` partials directly, and Spark plans ``count(distinct
  doc_id)`` as a two-phase agg keyed on (token, doc_id) — the hot
  token's partials are spread across its distinct doc_ids, so no single
  task ever sees the full "the" row stream. No salting needed: partial
  aggregation IS the skew defense for algebraic aggregates.
- Top-N is ``orderBy().limit(n)`` → Spark's TakeOrderedAndProject:
  per-partition heaps of n rows + one driver merge, never a global sort
  shuffle.
- The final rank is a window over n rows (the already-collected top-N),
  not over the vocabulary.

Deterministic contract: ties broken by (cf DESC, token ASC) everywhere —
the same total order in the heap, the limit, and the rank — so the
result is reproducible and oracle-checkable row for row.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def vocab_topk(
    documents: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ DataFrame(token, cf, df, rank): the ``n`` most frequent tokens
    with collection frequency (total occurrences) and document frequency
    (distinct documents), ranked by (cf DESC, token ASC)."""
    if n <= 0:
        raise ValueError(f"vocab_topk: n must be positive, got {n}")
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("token"),
    )
    stats = toks.groupBy("token").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = stats.orderBy(F.desc("cf"), F.asc("token")).limit(n)
    # rank over the n surviving rows only — a single tiny partition by
    # construction, never the full vocabulary
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("cf"), F.asc("token")))
    )


def bpe_pair_counts(
    documents: DataFrame,
    n: int,
    *,
    text_col: str = "text",
) -> DataFrame:
    """→ DataFrame(left, right, pair_count, rank): the ``n`` most frequent
    ADJACENT CHARACTER PAIRS inside words, weighted by word frequency —
    the first-iteration merge candidates of BPE tokenizer training
    (Sennrich et al. 2016: the training loop repeatedly merges the
    current most-frequent symbol pair; this operator is that loop's
    counting step at iteration 0, the one that must scan the corpus).

    The standard BPE trick makes this corpus-scale-friendly: aggregate
    the corpus to the WORD-FREQUENCY table first (map-side-combinable
    groupBy — the only pass over the 100 TB side), then explode character
    pairs over the distinct-word table only, multiplying each pair by the
    word's corpus frequency. The expensive char-level explosion runs over
    |vocab| rows, not |corpus| — at web scale the vocabulary is millions
    of words while the corpus is trillions of tokens.

    Ties broken (pair_count DESC, left ASC, right ASC); top-N via
    TakeOrdered; rank windowed over the n survivors only."""
    if n <= 0:
        raise ValueError(f"bpe_pair_counts: n must be positive, got {n}")
    words = (
        documents.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    # guard: sequence(1, 0) DESCENDS in Spark, so 1-char words need an
    # explicit empty pair list, not greatest()-clamping
    idx = F.when(
        F.size(chars) >= 2, F.sequence(F.lit(1), F.size(chars) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        "freq",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(chars, i).alias("left"),
                    F.element_at(chars, (i + 1).cast("int")).alias("right"),
                ),
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy(
        F.col("pair.left").alias("left"), F.col("pair.right").alias("right")
    ).agg(F.sum("freq").alias("pair_count"))
    top = counts.orderBy(
        F.desc("pair_count"), F.asc("left"), F.asc("right")
    ).limit(n)
    return top.withColumn(
        "rank",
        F.row_number().over(
            W.orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        ),
    )


def bpe_train_merges(
    documents: DataFrame,
    n_merges: int = 8,
    *,
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer TRAINING — the first ``n_merges`` merge rules
    (Sennrich et al. 2016), learned as a distributed fixed-point loop:

    → DataFrame(rank, left, right, pair_count): merge i joined the
    symbol pair (left, right) whose corpus-weighted adjacent count was
    maximal at step i (ties: count DESC, left ASC, right ASC — a total
    order, so training is deterministic).

    The classic scalability structure: the corpus is scanned ONCE into
    the word-frequency table (map-side-combinable groupBy — the only
    100 TB-sized pass), then every merge iteration runs over the
    |vocab|-sized symbolized-word table: count adjacent symbol pairs
    (weighted by word freq), take the top pair (TakeOrdered on a tiny
    table), and apply the merge per word with a greedy-leftmost fold —
    pure string/array algebra, no Python, no collect (the winning pair
    rides a one-row crossJoin into the next round's fold, and each
    round's table is localCheckpointed so the plan stays O(1) in the
    merge count — the walks.py loop discipline).

    Words are carried as space-delimited symbol strings (symbols never
    contain spaces: the tokenizer splits on \\s+). The fold reproduces
    canonical greedy-leftmost BPE: "aaa" under merge (a,a) → "aa a",
    "abab" under (a,b) → "ab ab". If every word collapses to a single
    symbol before ``n_merges`` rounds, the remaining rounds emit no rows
    (the twin behaves identically).
    """
    if n_merges <= 0:
        raise ValueError(f"bpe_train_merges: n_merges must be positive, got {n_merges}")
    words = (
        documents.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    w = words.select(
        F.array_join(F.filter(F.split("word", ""), lambda c: c != ""), " ").alias("w"),
        "freq",
    ).localCheckpoint(eager=True)

    merge_rows = []
    for i in range(1, n_merges + 1):
        parts = F.split("w", " ")
        n1 = F.greatest(F.size(parts) - F.lit(1), F.lit(0))
        pairs = (
            w.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(parts, 1, n1).alias("l"),
                        F.slice(parts, 2, n1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            top.select(F.lit(i).alias("rank"), "left", "right", "pair_count")
        )

        w = (
            w.crossJoin(top.select("left", "right"))
            .select(
                F.aggregate(
                    F.split("w", " "),
                    F.lit(""),
                    _merge_fold(F.col("left"), F.col("right")),
                ).alias("w"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )

    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def _merge_fold(left, right):
    """Greedy-leftmost single-merge fold over a space-delimited symbol
    string: accumulate symbols left-to-right, merging each incoming
    symbol into the accumulator's tail whenever (tail, incoming) equals
    the merge pair — canonical BPE application semantics ('aaa' under
    (a,a) → 'aa a'). Shared by training (pair columns from the one-row
    winner crossJoin) and encoding (literal pairs from the model)."""

    def _fold(acc, x):
        accp = F.split(acc, " ")
        merged = F.array_join(
            F.concat(
                F.slice(accp, 1, F.size(accp) - 1),
                F.array(F.concat(left, right)),
            ),
            " ",
        )
        return (
            F.when(acc == "", x)
            .when((F.element_at(accp, -1) == left) & (x == right), merged)
            .otherwise(F.concat(acc, F.lit(" "), x))
        )

    return _fold


def bpe_encode(
    documents: DataFrame,
    merges: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer APPLICATION — encode every document with a trained
    merge table (the other half of ``bpe_train_merges``: train once,
    encode the whole corpus).

    → DataFrame(id_col, n_tokens, n_subwords, subword_text): per
    document, the whitespace-token count, the subword count after all
    merges, and the full encoded sequence as a space-delimited symbol
    string (per-token encodings joined in token order — byte-exact, so
    the oracle twin checks every symbol boundary). Documents with no
    tokens survive with (0, 0, '').

    Scale shape (100 TB lens):
    - The merge table IS the tokenizer model: ≤ n_merges rows by
      construction, collected once to the driver (the bounded
      model-sized collect, same class as ivf_topk's query vectors) and
      applied as literal fold expressions — no per-round join against
      the corpus.
    - Merges are applied over the DISTINCT-WORD table only (|vocab|,
      sublinear in corpus size — the same collapse that makes training
      tractable), with the symbolized column localCheckpointed every few
      merges so the plan stays O(1) in merge count while the nested
      aggregate() expressions stay within codegen limits.
    - The corpus is touched exactly twice: one pass to explode
      (doc, pos, word) and one |vocab|-sized equi-join to map each word
      to its encoding (AQE broadcasts the encoding side when it fits);
      per-doc reassembly is a groupBy bounded by document length.
    - Encoding is deterministic given the merge table — reproducible
      across runs, engines, and partitionings.

    Greedy-leftmost application matches training exactly (shared
    ``_merge_fold``), i.e. each rule is applied to fixpoint per word in
    rank order — Sennrich et al. 2016's reference `apply_bpe` semantics
    for rules learned on this corpus.
    """
    need = {"rank", "left", "right"}
    if not need.issubset(set(merges.columns)):
        raise ValueError(
            f"bpe_encode: merges must have columns {sorted(need)}, got {merges.columns}"
        )
    # the model: ≤ n_merges rows by construction (bounded collect)
    mrows = [
        (r["left"], r["right"])
        for r in merges.select("rank", "left", "right").orderBy("rank").collect()
    ]

    toks = documents.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    )
    enc = (
        toks.select(F.explode("toks").alias("word"))
        .distinct()
        .select(
            "word",
            F.array_join(
                F.filter(F.split("word", ""), lambda c: c != ""), " "
            ).alias("w"),
        )
    )
    for i, (left, right) in enumerate(mrows, 1):
        enc = enc.select(
            "word",
            F.aggregate(
                F.split("w", " "), F.lit(""), _merge_fold(F.lit(left), F.lit(right))
            ).alias("w"),
        )
        # checkpoint every few merges: plan O(1) in merge count, nested
        # fold expressions bounded (the walks.py loop discipline)
        if i % 4 == 0 or i == len(mrows):
            enc = enc.localCheckpoint(eager=True)

    encoded = (
        toks.select(F.col(id_col), F.posexplode("toks").alias("pos", "word"))
        .join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.size(F.split("w", " "))).alias("n_subwords"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("subword_text"),
        )
    )
    return documents.select(F.col(id_col)).distinct().join(encoded, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("n_subwords", F.lit(0).cast("long")).alias("n_subwords"),
        F.coalesce("subword_text", F.lit("")).alias("subword_text"),
    )


def zipf_fit(
    documents: DataFrame,
    top_n: int = 1000,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    skip_ranks: int = 0,
) -> DataFrame:
    """→ one row (slope, intercept, tokens_fit): OLS fit of
    ln(cf) = slope·ln(rank) + intercept over the ``top_n`` most frequent
    tokens — the Zipf-law diagnostic (natural corpora slope ≈ −1; a
    boilerplate-flooded or template-heavy crawl bends it). ``skip_ranks``
    drops the first few ranks (function words routinely sit above the
    Zipf line; Piantadosi 2014 reviews the fit conventions).

    Scale shape: rides vocab_topk — the corpus collapses to the token
    frequency table with map-side combine, the top-N cut is
    TakeOrderedAndProject (never a global sort), and the regression runs
    as ONE aggregate over ≤ top_n rows (the closed-form OLS sums — no
    per-row driver work, no window over the corpus)."""
    top = vocab_topk(documents, top_n, text_col=text_col, id_col=id_col)
    pts = top.filter(F.col("rank") > skip_ranks).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cf").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        F.col("n").alias("tokens_fit"),
    )


def heaps_fit(
    documents: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 100,
    round_to: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """→ one row (slope, intercept, docs_fit): OLS fit of
    ln V(n) = slope·ln n + intercept over the corpus's vocabulary-growth
    curve — Heaps' law V(n) = K·n^β (β ≈ 0.4-0.6 on natural corpora;
    Heaps 1978, and the empirical review in Piantadosi 2014). One point
    per document in ``id_col`` order: n = cumulative token count, V =
    cumulative distinct-token count. The tokenizer-planning companion to
    ``zipf_fit``: β tells you how fast the vocab (and a BPE merge table's
    long tail) keeps growing with corpus size; a template-flooded crawl
    bends β down. ``min_tokens`` drops the tiny-prefix points (the curve
    is not yet in its power-law regime below a few hundred tokens).

    Scale shape: the curve needs a GLOBAL prefix sum — computed with the
    repo's two-level scan (pack_documents/global_rank pattern:
    range-partition by id, window-cumsum within partitions, collect the
    ≤P partition totals, broadcast the exclusive prefix back — driver
    traffic bounded by the partition count, never |corpus|). V(n) comes
    for free from the SAME scan: a token's first occurrence is
    min(doc_id) over an aggregated (token → first_doc) table, so
    "new tokens in doc d" is one more groupBy — no distinct-over-prefix
    anywhere. The OLS itself is one closed-form aggregate."""
    if min_tokens < 0:
        raise ValueError(f"heaps_fit: min_tokens must be ≥ 0, got {min_tokens}")
    spark = documents.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    from ..functions.text import token_count_expr

    per_doc = documents.select(
        F.col(id_col).alias("doc_id"), token_count_expr(F.col(text_col)).alias("n_tok")
    )
    first = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_expr(F.col(text_col))).alias("token"),
        )
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("new_tok"))
    )
    rows = per_doc.join(first, "doc_id", "left").select(
        "doc_id", "n_tok", F.coalesce("new_tok", F.lit(0)).alias("new_tok")
    )

    parted = rows.repartitionByRange(partitions, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    w = W.partitionBy("_pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    # localCheckpoint: range boundaries are re-sampled per execution, so
    # _pid must come from ONE materialization (pack_documents precedent)
    local = parted.withColumn("_ln", F.sum("n_tok").over(w)).withColumn(
        "_lv", F.sum("new_tok").over(w)
    ).localCheckpoint(eager=True)
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_ln").alias("_tn"), F.max("_lv").alias("_tv"))
        .collect()
    )
    totals.sort(key=lambda r: r._pid)
    prefix, accn, accv = [], 0, 0
    for row in totals:
        prefix.append((row._pid, accn, accv))
        accn += row._tn
        accv += row._tv
    pre = spark.createDataFrame(prefix, "_pid int, _pn long, _pv long")

    pts = (
        local.join(F.broadcast(pre), "_pid")
        .select(
            (F.col("_pn") + F.col("_ln")).alias("cum_tok"),
            (F.col("_pv") + F.col("_lv")).alias("cum_vocab"),
        )
        .filter((F.col("cum_tok") >= min_tokens) & (F.col("cum_vocab") > 0))
        .select(
            F.log(F.col("cum_tok").cast("double")).alias("x"),
            F.log(F.col("cum_vocab").cast("double")).alias("y"),
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.round(slope, round_to).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), round_to).alias("intercept"),
        F.col("n").alias("docs_fit"),
    )


def token_countmin(
    documents: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch of the corpus token-frequency distribution
    (Cormode & Muthukrishnan 2005) → (d int, col int, cnt long), ≤
    depth·width rows. Row d hashes each token occurrence to
    H48('{salt}:{d}:' || token) mod width and counts per cell;
    ``countmin_lookup`` answers point queries with min over rows —
    one-sided error (never an undercount), overcount ≤ e·N/width w.p.
    1−e^−depth.

    The 100 TB story vs ``vocab_topk``: the exact histogram's state is
    the full vocabulary (unbounded — web-scale corpora have billions of
    distinct tokens), while the sketch is a FIXED depth×width integer
    grid whatever the corpus: the groupBy key domain is ≤ depth·width,
    partial aggregation collapses every partition to ≤ depth·width cells
    map-side, and sketches of corpus shards merge by cell-wise ADD (the
    linearity the literature exploits for distributed/streaming counts).
    Hash is the portable MD5 family (avalanche — the sampling-bucket
    argument), so the sketch is bit-identical across engines and the
    DuckDB twin reproduces every cell."""
    toks = documents.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    from .walks import _hash48

    cells = toks.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
        "token",
    ).select(
        "d",
        (
            _hash48(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("d").cast("string"),
                    F.lit(":"),
                    F.col("token"),
                )
            )
            % F.lit(width)
        )
        .cast("int")
        .alias("col"),
    )
    return cells.groupBy("d", "col").agg(F.count("*").cast("long").alias("cnt"))


def token_hll(
    documents: DataFrame,
    *,
    p: int = 8,
    text_col: str = "text",
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog registers of the DISTINCT-token set (Flajolet et al.
    2007) → (reg int, rho int), exactly 2^p rows (0 where untouched).
    Each token occurrence hashes once with the portable MD5 H48 family:
    low p bits pick the register, the remaining 48−p bits' trailing-zero
    rank is max-merged per register.

    The third leg of the bounded-state sketch toolkit (count-min =
    frequencies, Bloom = membership, HLL = cardinality): the exact
    vocabulary count needs a distinct over an unbounded key domain,
    while this is a FIXED 2^p-row grid — ``max`` is map-side combinable
    (each partition reduces to ≤ 2^p rows before the exchange, hot
    tokens collapse in the partial agg) and shard sketches merge by
    cell-wise MAX. Registers are engine-bit-identical (the DuckDB twin
    reproduces every cell); ``hll_estimate`` turns them into the
    cardinality estimate (±1.04/√2^p relative error)."""
    if not 4 <= p <= 14:
        raise ValueError("token_hll: p must be in [4, 14]")
    m = 1 << p
    from .walks import _hash48

    h = _hash48(F.concat(F.lit(f"{salt}:"), F.col("token")))
    w = F.shiftright(h, p)  # h < 2^48 and nonneg: arithmetic == logical
    rho = (
        F.when(w == 0, F.lit(48 - p + 1))
        # (w & -w) isolates the lowest set bit — an exact power of two,
        # so log2 over double is exact (the neighborhood.py argument)
        .otherwise(F.log2(w.bitwiseAND(-w)).cast("int") + F.lit(1))
        .cast("int")
    )
    regs = (
        documents.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
        .select((h % m).cast("int").alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    full = documents.sparkSession.range(m).select(
        F.col("id").cast("int").alias("reg")
    )
    return full.join(regs, "reg", "left").select(
        "reg", F.coalesce(F.col("rho"), F.lit(0)).cast("int").alias("rho")
    )


def hll_estimate(sketch: DataFrame, *, p: int = 8) -> float:
    """Distinct-count estimate from a ``token_hll`` register table:
    standard HLL harmonic mean with the small-range linear-counting
    correction. One ≤2^p-row aggregate, one scalar collect."""
    from .neighborhood import _alpha

    m = 1 << p
    row = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho").cast("double"))).alias("z"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    ).collect()[0]
    raw = _alpha(m) * m * m / row["z"]
    if raw <= 2.5 * m and row["zeros"] > 0:
        return m * math.log(m / row["zeros"])
    return raw


def countmin_lookup(
    sketch: DataFrame,
    tokens: list[str],
    *,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the sketch for a bounded token list → (token, est long):
    est = min over rows d of the (d, h_d(token)) cell (0 if absent — the
    cell was never touched). The probe side is |tokens|·depth literal
    rows, broadcast against the ≤ depth·width-row sketch."""
    spark = sketch.sparkSession
    from .walks import _hash48

    probe = spark.createDataFrame(
        [(t, d) for t in tokens for d in range(depth)], "token string, d int"
    ).select(
        "token",
        "d",
        (
            _hash48(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("d").cast("string"),
                    F.lit(":"),
                    F.col("token"),
                )
            )
            % F.lit(width)
        )
        .cast("int")
        .alias("col"),
    )
    return (
        probe.join(sketch, ["d", "col"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
