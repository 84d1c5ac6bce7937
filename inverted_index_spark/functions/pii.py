"""PII detection/redaction for training-data pipelines: emails,
IPv4 addresses, long digit (phone-like) sequences.

Capability extension (no reference analog): the standard scrub pass a
corpus takes before indexing/training. Everything is built-in
``regexp_count`` / ``regexp_replace`` column expressions — JVM-side,
whole-stage-codegen'd, zero Python in the hot path — so the scrub
fuses into the same scan as tokenization at any scale.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle): character classes only, no
lookarounds, no backreferences, so the DuckDB twin in
``__spark_entry__.oracle_sql`` matches byte-for-byte. Replacement
order is pinned (emails → IPs → phones) because the pattern domains
overlap (an email's local part can contain digits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common Java-regex/RE2 subset; \b is supported by both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# 7+ digit runs optionally broken by single spaces/dashes/dots: phone-ish.
PHONE_RE = r"\+?[0-9]([ .-]?[0-9]){6,}"

_TOKENS = {"EMAIL": EMAIL_RE, "IP": IPV4_RE, "PHONE": PHONE_RE}


def scrubbed_col(text: Column) -> Column:
    """text with PII spans replaced by <EMAIL>/<IP>/<PHONE> tokens,
    in pinned order (emails first — their local parts may contain
    digit runs the phone pattern would otherwise eat)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, any_pii) per document.

    Counts are measured on the progressively-scrubbed text exactly as
    :func:`scrubbed_col` would see it, so the three counts partition
    the scrubbed spans (an IP inside an email is counted once, as an
    email)."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(after_email, F.lit(IPV4_RE))
    n_phones = F.regexp_count(after_ip, F.lit(PHONE_RE))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).alias("any_pii"),
    )


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, scrubbed) — the redacted corpus text."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        scrubbed_col(F.col(text_col)).alias("scrubbed"),
    )
