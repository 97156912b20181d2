"""PII scrubbing for training corpora: emails / IPv4 addresses / phone
numbers replaced with typed placeholders, plus per-doc redaction counts
— the standard pre-training redaction pass (e.g. the C4 / RefinedWeb /
BigScience ROOTS pipelines all ship a variant of exactly this).

Everything is pure Catalyst ``regexp_replace`` / ``regexp_count`` over
an RE2-compatible regex subset (no lookaround, no backreferences), so
the pass is whole-stage-codegen JVM work that scales linearly with the
corpus AND the DuckDB correctness oracle can run the IDENTICAL patterns
(__spark_entry__.py: scrub_pii).

Replacement order is email -> ipv4 -> phone: the earlier replacement
consumes its span, so the looser phone pattern can never re-match the
digits of an already-redacted IP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe (DuckDB) AND Java-regex-safe (Spark) patterns.
EMAIL_RX = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RX = r"\+?\d{3}[\-. ]\d{3,4}[\-. ]\d{4}"

_PLACEHOLDERS = (
    (EMAIL_RX, "[EMAIL]", "n_emails"),
    (IPV4_RX, "[IP]", "n_ips"),
    (PHONE_RX, "[PHONE]", "n_phones"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): ``text_col`` with
    every email / IPv4 / phone match replaced by its placeholder, and the
    pre-replacement match counts (counted on the ORIGINAL text — the
    replacement chain cannot create or destroy counted matches)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).cast("long").alias(name)
        for rx, _p, name in _PLACEHOLDERS
    ]
    clean = F.col(text_col)
    for rx, placeholder, _name in _PLACEHOLDERS:
        clean = F.regexp_replace(clean, rx, placeholder)
    return docs.select("doc_id", clean.alias("clean_text"), *counts)
