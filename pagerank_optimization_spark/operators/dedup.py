"""Deduplication operators over the ``documents`` table — the standard
web-scale training-corpus cleaning ladder, each as a distributed DataFrame
pipeline:

1. ``exact_dedup``        hash-groupBy on normalized text (cheapest)
2. ``ngram_jaccard_pairs``exact k-gram Jaccard via shingle self-join
                          (SQL-expressible → DuckDB-oracle-checked)
3. ``minhash_lsh_pairs``  MinHash signatures + banded LSH candidate join
                          (the sub-quadratic scale path)
4. ``simhash_pairs``      64-bit SimHash + chunk-banded Hamming candidates
5. embedding cosine near-dup lives in operators.similarity

Scale notes: every pipeline is shuffle-bounded by (a) an explode of
documents into shingles/bands — linear in corpus size, and (b) a self-join
on shingle/band keys. Hot shingles (boilerplate) are the skew hazard: both
pair-generating joins cap per-key fan-out via a frequency filter
(``max_shingle_freq``) exactly like stop-word removal in MinHashLSH
practice — a shingle shared by thousands of docs contributes no
discriminative signal but O(f²) join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pagerank_optimization_spark.functions.text import fingerprint_expr, tokens_expr


def exact_dedup(documents: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (doc_id, canonical_id, n_copies): every doc mapped to the min-id
    representative of its normalized-text equality class. Survivors are the
    rows with doc_id == canonical_id."""
    fp = documents.select(F.col(id_col), fingerprint_expr(F.col(text_col)).alias("fp"))
    w = W.partitionBy("fp")
    return (
        fp.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .select(id_col, "canonical_id", "n_copies")
    )


def shingles(
    documents: DataFrame, *, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, shingle): distinct word k-grams per document, built with a
    lateral sequence/slice explode — no Python, fully codegen'd."""
    toks = tokens_expr(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)) - 1 + F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return (
        documents.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .filter(F.size(F.split(F.col("shingle"), " ")) == k)
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    *,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact k-gram Jaccard near-duplicate pairs: → (a, b, jaccard) with
    a < b and jaccard ≥ threshold. Shingle self-join + |A∩B| count, sizes
    joined back for |A∪B| = |A|+|B|−|A∩B|."""
    sh = shingles(documents, k=k, id_col=id_col, text_col=text_col)
    # skew guard: drop boilerplate shingles with pathological fan-out
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh = sh.join(freq.filter(F.col("df") <= max_shingle_freq), "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 8).alias("jaccard"))
    )


def minhash_signatures(
    documents: DataFrame,
    *,
    num_perm: int = 64,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """→ (doc_id, sig array<long>): MinHash signature per document.
    Permutation i is min over shingles of xxhash64(shingle, seed+i) — one
    hash-groupBy with num_perm JVM-side min aggregates (no UDF)."""
    sh = shingles(documents, k=k, id_col=id_col, text_col=text_col)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sigs = sh.groupBy(id_col).agg(*mins)
    return sigs.select(id_col, F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Banded-LSH candidate generation + signature-level verification:
    → (a, b, est_jaccard) with a < b, est_jaccard (matching signature
    fraction) ≥ threshold. Sub-quadratic: pairs are only generated inside
    band buckets; bucket size capped (skew guard for boilerplate-heavy
    corpora)."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sigs = minhash_signatures(
        documents, num_perm=num_perm, k=k, id_col=id_col, text_col=text_col, seed=seed
    ).persist()
    band_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.col("sig")[bi * rows + r].cast("string") for r in range(rows)])).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(band_cols).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    # skew guard: drop pathologically large buckets
    bucket_sizes = banded.groupBy("band", "bh").agg(F.count("*").alias("bs"))
    banded = banded.join(
        bucket_sizes.filter(F.col("bs") <= max_bucket_size), ["band", "bh"], "left_semi"
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .distinct()
    )
    verified = (
        cand.join(sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b")), "b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
            / F.lit(float(num_perm)),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", F.round("est_jaccard", 8).alias("est_jaccard"))
    )
    return verified


def simhash(
    documents: DataFrame,
    *,
    bits: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """→ (doc_id, simhash long): per-bit majority vote over token hashes —
    bits columns of JVM-side sums, reassembled into one 64-bit value."""
    toks = documents.select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("tok")
    )
    h = F.xxhash64(F.col("tok"), F.lit(seed))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: XOR == OR == ADD
    return agg.select(id_col, sim.alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    *,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """SimHash near-duplicate pairs: → (a, b, hamming ≤ max_hamming), a < b.
    Candidates via 4×16-bit chunk banding (pigeonhole: hamming ≤ 3 ⇒ some
    16-bit chunk is identical), verified with bit_count(xor)."""
    sims = simhash(documents, id_col=id_col, text_col=text_col, seed=seed).persist()
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ch"),
            )
            for c in range(4)
        ]
    )
    banded = sims.select(F.col(id_col), "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ch").alias("ch")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["chunk", "ch"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"),
            F.col(f"y.{id_col}").alias("b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
