"""Deterministic synthetic document corpus with PLANTED duplicate
structure — the pipeline-bench fixture generator (the dedup analog of
sources.transcripts.synthesize_transcripts; same design rules: pure
seeded functions over ``spark.range``, no driver loops, no RNG state).

The corpus is built so every dedup-ladder defense has something real to
hit at ANY size (the sf tables' organic corpus never fires the skew caps,
so the 100 TB skew story was pytest-only until this fixture — r4 VERDICT
"Next round" #3):

- a MEGA near-dup family (``mega_family`` docs sharing a ~100-token base,
  each with one unique trailing token): NOT exact-equal, so it survives
  the exact tier and lands >500 docs in shared MinHash band buckets —
  ``max_bucket_size`` observably fires inside the cascade;
- a BOILERPLATE prefix on ~30% of docs: its shingles' doc frequency
  exceeds ``max_shingle_freq`` at every size — the n-gram skew cap fires;
- exact-duplicate groups of 5 (stage-1 removals), near-dup families of 4
  (stage-2 removals), and a unique-doc tail (survivors), all in
  size-proportional bands so per-stage removal RATES stay comparable
  across corpus sizes — what amortizes in a size sweep is the fixed job
  overhead, not the workload shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = 30_011  # prime-ish vocabulary size for hash-derived tokens
BOILERPLATE = (
    "terms of service apply contact support for assistance "
    "all rights reserved unauthorized reproduction prohibited"
)


def synthesize_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    *,
    mega_family: int = 800,
    base_tokens: int = 96,
) -> DataFrame:
    """→ DataFrame(doc_id long, text string), deterministic in (n_docs,
    seed). Layout by doc_id band (sizes proportional to n_docs except the
    fixed-size mega family):

    - [0, mega)               mega near-dup family (shared base + 1 unique token)
    - [mega, mega+n/10)       exact-duplicate groups of 5
    - [mega+n/10, mega+n/4)   near-dup families of 4 (unique trailing token)
    - [mega+n/4, mega+11n/20) boilerplate-prefixed unique docs
    - rest                    plain unique docs
    """
    mega = min(mega_family, max(0, n_docs // 4))
    b_exact = mega + n_docs // 10
    b_near = mega + n_docs // 4
    b_boiler = mega + (11 * n_docs) // 20

    def body(key, n_tok, salt: int):
        toks = F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(key, i, F.lit(seed + salt)), F.lit(_VOCAB)).cast("string"),
            ),
        )
        return F.concat_ws(" ", toks)

    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    did = F.col("doc_id")
    # per-doc token count 32..151, a deterministic function of the CONTENT
    # key so exact-dup group members get identical lengths
    exact_key = F.lit(0) + (did - ((did - F.lit(mega)) % 5))
    near_key = F.lit(0) + (did - ((did - F.lit(b_exact)) % 4))
    var_len = lambda key: (  # noqa: E731
        F.lit(32) + F.pmod(F.xxhash64(key, F.lit(seed + 7)), F.lit(120)).cast("int")
    )
    uniq_tok = F.concat(F.lit("u"), did.cast("string"))

    text = (
        F.when(
            did < F.lit(mega),
            # mega family: boilerplate + shared base + one unique token
            F.concat_ws(
                " ", F.lit(BOILERPLATE), body(F.lit(-1), F.lit(base_tokens), 1), uniq_tok
            ),
        )
        .when(did < F.lit(b_exact), body(exact_key, var_len(exact_key), 2))
        .when(
            did < F.lit(b_near),
            F.concat_ws(" ", body(near_key, var_len(near_key), 3), uniq_tok),
        )
        .when(
            did < F.lit(b_boiler),
            F.concat_ws(" ", F.lit(BOILERPLATE), body(did, var_len(did), 4)),
        )
        .otherwise(body(did, var_len(did), 5))
    )
    return df.select("doc_id", text.alias("text"))
