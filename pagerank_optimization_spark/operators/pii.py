"""PII redaction for training-data curation: regex scrubbing of emails,
IPv4 addresses, SSN-shaped ids, and phone-shaped numbers, with per-rule
match counts.

Every public web-corpus pipeline runs a pass like this before training
(C4 strips lines with "badwords", CCNet and refined-web variants scrub
emails/IPs/phones); the engine needs it as a first-class scan-side
operator. All rules are pure ``regexp_count``/``regexp_replace`` —
JVM-side, whole-stage-codegen'd, zero UDFs, zero shuffles — so the
redaction pass fuses into whatever scan feeds it and costs one pipelined
map stage at any corpus size.

Rule language is deliberately the common subset of Java regex (Spark)
and RE2 (DuckDB): character classes, bounded repetition, ``\\b`` word
boundaries — no alternation-order or backreference constructs whose
semantics differ between backtracking and automaton engines. That makes
the operator DuckDB-oracle-checkable on exact redacted strings, not just
counts.

Counting semantics: ``n_<rule>`` counts matches of rule i in the text
AFTER rules 0..i-1 were applied — exactly the occurrences that rule's
replacement rewrites, so counts and output text are one consistent
sequential story (and earlier redactions can never double-count as later
rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER. Email first (its
# local-part digits would otherwise feed the number rules), then dotted
# quads, then SSN (3-2-4) before the wider phone shape (3-3/4-4; the two
# are disjoint, but the order documents the intent).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[- .]\d{3,4}[- .]\d{4}\b", "<PHONE>"),
]


def redact_pii(
    documents: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ DataFrame(doc_id, n_email, n_ipv4, n_ssn, n_phone,
    text_redacted): per-document PII match counts plus the scrubbed text.
    One codegen'd projection — 2 regex passes per rule, no Python, no
    shuffle."""
    cols = [F.col(id_col).alias("doc_id")]
    cur = F.col(text_col)
    for name, pat, repl in PII_RULES:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    cols.append(cur.alias("text_redacted"))
    return documents.select(*cols)
