"""Deterministic sampling and sequence packing for training-data
pipelines.

At 100 TB, `df.sample()` is the wrong tool: it is seed-and-partitioning
dependent, so re-running the pipeline (or resuming half of it) yields a
DIFFERENT sample. Production corpus pipelines sample by CONTENT HASH —
a row is in the sample iff hash(key) lands under the rate threshold —
which is reproducible across runs, engines, partitionings, and cluster
sizes, and composes (a 1% sample is a subset of the 10% sample under the
same salt). The hash here is MD5 (native and bit-identical in both Spark
and DuckDB; the poly fingerprint family lacks avalanche on short keys —
see _sample_bucket), so every sampling operator is oracle-checkable end
to end.

``pack_documents`` is GPT-style sequence packing: concatenate documents
in a global deterministic order and chop every ``budget`` tokens; each
document is assigned the bin where it STARTS plus its token offset within
that bin. The global running token count is computed with the standard
distributed two-level prefix scan (per-partition window cumsum + a
P-row collect of partition totals broadcast back as offsets) — NOT a
single unpartitioned window, which would funnel the corpus through one
task. Output values are partition-count-invariant (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import token_count_expr, tokens_expr as tokens_expr_ref

SAMPLE_DENOM = 1_000_000


def _sample_bucket(key: Column, salt: str) -> Column:
    """Portable-hash sample bucket in [0, SAMPLE_DENOM).

    Uses MD5 (identical hex in Spark and DuckDB), NOT the repo's poly
    fingerprint family: threshold sampling needs AVALANCHE — under the
    31-ary polynomial the hash of a short key is a small un-wrapped
    polynomial in its characters, so bucket(key) is near-linear in key
    and `bucket < thr` selects contiguous id ranges (and changing the
    salt merely shifts the whole range). MD5's first 12 hex digits →
    48-bit int → mod 1e6 gives uniform, salt-decorrelated buckets and is
    exactly what production corpus pipelines do (CCNet-style hash
    sampling). Engine-portable: F.conv(hex,16,10) ≡ DuckDB
    CAST('0x'||hex AS BIGINT)."""
    s = F.concat(F.lit(salt), F.lit(":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long") % F.lit(
        SAMPLE_DENOM
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``rate`` sample: keep rows with
    bucket(key, salt) < floor(rate · 1e6). Same rows on every run /
    engine / partitioning; nested samples for the same salt."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"hash_sample: rate must be in [0, 1], got {rate}")
    thr = int(rate * SAMPLE_DENOM)
    return df.where(_sample_bucket(F.col(key_col), salt) < F.lit(thr))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 50% of 'en' docs,
    5% of everything else (the standard corpus language-rebalancing
    move). ``rates`` maps stratum value → rate; unlisted strata get
    ``default_rate``. The threshold is a broadcast-sized CASE expression
    (|rates| is human-scale), the filter is one codegen'd predicate —
    zero joins, zero shuffles."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"stratified_hash_sample: rate for {v!r} out of [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("stratified_hash_sample: default_rate out of [0, 1]")
    thr: Column = F.lit(int(default_rate * SAMPLE_DENOM))
    for v in sorted(rates):
        thr = F.when(
            F.col(stratum_col) == F.lit(v), F.lit(int(rates[v] * SAMPLE_DENOM))
        ).otherwise(thr)
    return df.where(_sample_bucket(F.col(key_col), salt) < thr)


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Per-row importance sampling, deterministic by content hash: keep a
    row iff bucket(key, salt) < clamp(weight, 0, 1)·1e6 — i.e. each row's
    keep probability IS its weight (quality score, language prior,
    upsampling factor ≤ 1), but the coin flip is the same reproducible
    MD5 bucket as hash_sample, so the sample is stable across runs /
    engines / partitionings and nests across salts. This is the standard
    quality-weighted resampling move in corpus curation (keep good
    documents with high probability instead of a hard threshold) — a
    pure codegen'd predicate, zero joins, zero shuffles, and the filter
    sits directly on the scan."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.where(
        _sample_bucket(F.col(key_col), salt) < w * F.lit(float(SAMPLE_DENOM))
    )


def pack_documents(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing → (doc_id, n_tok, bin_id, offset_in_bin,
    spans_boundary): documents concatenated in ``id_col`` order and chopped
    every ``budget`` tokens. bin_id is the chunk where the document's
    first token lands; spans_boundary marks documents split across chunks.

    Two-level prefix scan: range-partition by id, window-cumsum within
    each partition, collect the P partition totals (P rows, bounded by
    the partition count, never by |corpus|), broadcast the exclusive
    prefix back. Results are independent of P (partition-invariance is
    part of the test contract)."""
    if budget <= 0:
        raise ValueError(f"pack_documents: budget must be positive, got {budget}")
    spark = docs.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism

    toks = docs.select(
        F.col(id_col).alias("doc_id"), token_count_expr(F.col(text_col)).alias("n_tok")
    )
    parted = toks.repartitionByRange(partitions, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    w = W.partitionBy("_pid").orderBy("doc_id")
    # localCheckpoint (not persist): range boundaries are re-SAMPLED per
    # execution (seed varies with the RDD id), so _pid must come from ONE
    # materialization — a cache-evicted recompute could shift partition
    # assignment between the totals collect and the output action and
    # silently mis-offset every row. Checkpointing pins the computed
    # blocks and severs the resample path entirely (hits.py precedent).
    local = parted.withColumn(
        "_local_end", F.sum("n_tok").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).localCheckpoint(eager=True)

    # P rows → exclusive prefix per partition, broadcast back
    totals = (
        local.groupBy("_pid").agg(F.max("_local_end").alias("_total")).collect()
    )
    totals.sort(key=lambda r: r._pid)
    prefix, acc = {}, 0
    for row in totals:
        prefix[row._pid] = acc
        acc += row._total
    pre = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _prefix long"
    )

    out = (
        local.join(F.broadcast(pre), "_pid")
        .withColumn("_start", F.col("_prefix") + F.col("_local_end") - F.col("n_tok"))
        .withColumn("bin_id", F.floor(F.col("_start") / budget))
        .withColumn("offset_in_bin", F.col("_start") % budget)
        .withColumn(
            "spans_boundary",
            F.when(
                F.col("n_tok") > 0,
                F.floor((F.col("_start") + F.col("n_tok") - 1) / budget)
                > F.col("bin_id"),
            ).otherwise(F.lit(False)),
        )
        .select("doc_id", "n_tok", "bin_id", "offset_in_bin", "spans_boundary")
    )
    return out


def source_mix_weights(
    docs: DataFrame,
    *,
    alpha: float = 0.7,
    token_budget: int | None = None,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 8,
) -> DataFrame:
    """Temperature-scaled source mixing weights — the multinomial
    sampling distribution multilingual/multi-source LLM corpora train
    under (Lample & Conneau 2019 eq. for α-smoothed sampling; the Pile /
    LLaMA "epochs per source" table is this with an explicit budget):

        p_s = (tokens_s)^α / Σ_t (tokens_t)^α

    α < 1 upsamples small sources relative to their natural share; α = 1
    is proportional sampling; α = 0 is uniform.

    → (source, n_docs, total_tokens, natural_share, weight[, epochs]) —
    ``epochs`` (how many passes over source s a ``token_budget``-token
    training run makes: budget·p_s / tokens_s) only when a budget is
    given.

    Scale shape: one map-side-combinable agg over the corpus; the
    per-source table (tiny) then self-normalizes through a one-row
    crossJoin — no collect, no window."""
    if alpha < 0:
        raise ValueError(f"source_mix_weights: alpha must be ≥ 0, got {alpha}")
    per_src = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_expr(F.col(text_col))).alias("total_tokens"),
    )
    tot = per_src.agg(
        F.sum("total_tokens").alias("grand_tokens"),
        F.sum(F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))).alias("z"),
    )
    out = per_src.crossJoin(tot).select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("grand_tokens"), round_to).alias(
            "natural_share"
        ),
        F.round(
            F.pow(F.col("total_tokens").cast("double"), F.lit(alpha)) / F.col("z"),
            round_to,
        ).alias("weight"),
        F.col("grand_tokens"),
        F.col("z"),
    )
    if token_budget is not None:
        if token_budget <= 0:
            raise ValueError(
                f"source_mix_weights: token_budget must be positive, got {token_budget}"
            )
        out = out.withColumn(
            "epochs",
            F.round(
                F.lit(float(token_budget))
                * (F.pow(F.col("total_tokens").cast("double"), F.lit(alpha)) / F.col("z"))
                / F.col("total_tokens"),
                round_to,
            ),
        )
    return out.drop("grand_tokens", "z")


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 0,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token chunks with optional overlap
    — the context-window prep step between cleaning and packing (chunk
    long documents first, THEN pack_documents bins the chunks):

    chunk c covers tokens [c·stride, c·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; chunks are emitted while their
    start is inside the document, so the last chunk may be short
    (``min_tokens`` drops degenerate tails; an ``overlap`` tail that is
    only re-served tokens is still emitted if ≥ min_tokens — standard
    sliding-window convention).

    → (doc_id, chunk_idx, n_tok, chunk_text), chunk_text re-joined with
    single spaces (token-space reconstruction — the downstream tokenizer
    re-splits on whitespace, so this is lossless for training purposes;
    byte-exact original spans are the packing operator's business).

    Scale shape: pure array algebra per row (sequence → explode →
    slice → array_join) inside whole-stage codegen; output rows ≈
    corpus_tokens / stride. No shuffle at all — chunking composes with
    the parquet scan."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_documents: chunk_tokens must be ≥ 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"chunk_documents: overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col).alias("doc_id"), token_count_expr(F.col(text_col)).alias("n"),
        tokens_expr_ref(F.col(text_col)).alias("ts"),
    )
    n_chunks = F.when(F.col("n") <= 0, F.lit(0)).otherwise(
        F.floor((F.col("n") - 1) / F.lit(stride)).cast("int") + 1
    )
    chunks = (
        toks.withColumn("nch", n_chunks)
        .filter(F.col("nch") > 0)
        .select(
            "doc_id",
            "ts",
            F.explode(F.sequence(F.lit(0), F.col("nch") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                "ts", F.col("chunk_idx") * stride + 1, F.lit(chunk_tokens)
            ).alias("chunk"),
        )
    )
    return (
        chunks.select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("n_tok"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
        .filter(F.col("n_tok") >= min_tokens)
    )


def weighted_reservoir_sample(
    df: DataFrame,
    n: int,
    weight: Column,
    key_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Fixed-SIZE weighted sample without replacement — the complement of
    ``weighted_hash_sample`` (fixed RATE): exactly ``n`` rows, selection
    probability ∝ weight, via the Efraimidis–Spirakis A-ES scheme (2006):
    score each row k_i = u_i^(1/w_i) with u_i uniform in (0,1) and keep
    the n largest. The n-largest-k sample is EXACTLY a weighted draw
    without replacement, and the ordering is preserved under ln, so the
    score used is ln(u)/w (monotone, no pow underflow for tiny weights).

    u is deterministic — the full 48-bit MD5 bucket (not the 1e6-modulus
    sampling bucket; A-ES ordering needs fine granularity), so the sample
    is reproducible across runs/engines/partitionings and oracle-checkable
    like every sampling operator here. Rows with weight ≤ 0 or NULL are
    ineligible (A-ES requires w > 0). Ties broken by key.

    Distributed shape: orderBy(...).limit(n) compiles to TakeOrdered —
    per-partition top-n + a driver merge of P·n rows, never a global
    sort. → df columns + es_key (the ln-domain score, rounded 8dp)."""
    s = F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))
    h48 = F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
    u = (h48 + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    score = F.log(u) / weight.cast("double")
    return (
        df.where(weight.isNotNull() & (weight.cast("double") > 0))
        .withColumn("_es", score)
        .orderBy(F.col("_es").desc(), F.col(key_col))
        .limit(n)
        .withColumn("es_key", F.round(F.col("_es"), 8))
        .drop("_es")
    )
