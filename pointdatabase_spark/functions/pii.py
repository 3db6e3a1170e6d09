"""PII detection and redaction for training-data pipelines: find and
scrub emails, NANP phone numbers, and IPv4 addresses from a text
column — the standard pre-training privacy pass (the C4 / Dolma
pipelines ship the same regex family).

Spark-first design: detection counts and redaction are pure built-in
regexp expressions (JVM-side, whole-stage codegen, zero Python) — at
100 TB the pass is a single narrow map over the corpus with no
shuffle at all. Patterns are written in the regex subset that Java's
engine and DuckDB's RE2 interpret identically (no backrefs, no
lookaround), so the DuckDB oracle reproduces results bit-for-bit;
each pattern is defined ONCE below and rendered into both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> (regex, replacement token). Order matters for scrubbing:
# emails first (an email contains no phone/IP substring, but scrubbing
# digits first could split an email's host), then phones, then IPs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_counts(col: str) -> list[Column]:
    """One BIGINT match-count Column per PII class."""
    return [F.size(F.regexp_extract_all(F.col(col), F.lit(rx), F.lit(0)))
            .cast("bigint").alias(f"n_{name}")
            for name, rx, _ in PII_PATTERNS]


def pii_counts_sql(col: str) -> list[str]:
    """DuckDB fragments mirroring :func:`pii_counts` (aliased the same)."""
    return [f"CAST(len(regexp_extract_all({col}, '{rx}')) AS BIGINT)"
            f" AS n_{name}"
            for name, rx, _ in PII_PATTERNS]


def scrub(col: str) -> Column:
    """Text with every PII match replaced by its class token."""
    out = F.col(col)
    for _, rx, tok in PII_PATTERNS:
        out = F.regexp_replace(out, rx, tok)
    return out


def scrub_sql(col: str) -> str:
    out = col
    for _, rx, tok in PII_PATTERNS:
        out = f"regexp_replace({out}, '{rx}', '{tok}', 'g')"
    return out
