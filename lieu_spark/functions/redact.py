"""PII detection and redaction for transcript corpora.

Training-data pipelines scrub personally-identifying strings (emails,
phone numbers, IP addresses, national-ID-shaped numbers) before any
text leaves the raw zone. Everything here is pure Catalyst — JVM-side
``regexp_extract_all`` / ``regexp_replace`` inside whole-stage codegen,
no UDFs, no shuffle: a narrow per-row projection that scales linearly
to any corpus size and pushes down with the scan.

Pattern dialect is the intersection of Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, and ``\\b`` word
boundaries only — no backrefs or lookaround — so the DuckDB oracle
twin in oracle_sql.py applies the byte-identical patterns.

Redaction applies patterns in a FIXED order (email, ssn, phone, ip);
the order is part of the contract because placeholder text inserted by
an earlier rule must not be re-matched by a later one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: applied top-to-bottom by redact_pii, and the DuckDB
# oracle replays the same sequence. Keys double as placeholder names.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts on the ORIGINAL text (before redaction).

    Counting before redaction keeps the counts independent of rule
    order; the patterns are mutually non-overlapping on well-formed
    inputs (ssn is 3-2-4 digits, phone 3-3-4, an ip octet is <= 3
    digits so a dotted phone never parses as one).
    """
    raw = F.coalesce(text, F.lit(""))
    return {
        kind: F.size(F.regexp_extract_all(raw, F.lit(pat), 0)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with an angle-bracket placeholder
    (``<EMAIL>``, ``<SSN>``, ...), applying patterns in PII_PATTERNS
    order. Spark's regexp_replace is replace-all by default (the DuckDB
    twin passes the 'g' flag)."""
    out = F.coalesce(text, F.lit(""))
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
