"""PII detection and redaction — LLM-pipeline operators beyond the
reference's surface (training corpora must be scrubbed of emails, phone
numbers, SSNs and IP addresses before model consumption; the reference
validates clinical CSVs and has no prose-scrubbing stage).

Design notes (100 TB posture):

- **Map-only, JVM-side.** Every feature is a ``regexp_extract_all`` /
  ``regexp_replace`` Column expression — no Python in the row path, the
  scan parallelizes with the input, nothing shuffles. This is the shape
  that survives a 1000-executor corpus sweep: PII scrubbing is a pure
  per-document transform and must never cost more than the scan itself.
- **Cross-engine regex dialect.** Patterns stick to the syntax subset
  Java's regex (Spark) and RE2 (DuckDB oracle) evaluate identically:
  character classes, bounded repeats, ``\\b`` word boundaries and
  non-capturing groups only — no backrefs, no lookaround.
- **Redaction is deterministic** (fixed placeholder tokens), so the
  redacted text itself is hash-comparable across engines.

The synthetic ``documents`` corpus contains no organic PII, so the driver
query injects deterministic spans (same expression both engines) before
detection — the operator itself is corpus-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pattern table: (feature name, regex, redaction placeholder). Order
# matters for redaction: emails first so the phone/SSN digit runs inside
# an address (none in practice) are already collapsed.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_features(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts + fully redacted text, map-only.

    Returns ``(id, n_<kind>... , n_pii, has_pii, redacted)``; counts are
    longs (exact on both engines), ``redacted`` replaces every match with
    its placeholder token.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(rx), 0))
        .cast("long").alias(f"n_{name}")
        for name, rx, _ in PII_PATTERNS]
    redacted = F.col(text_col)
    for _, rx, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, rx, token)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return (df.select(F.col(id_col), *counts, redacted.alias("redacted"))
            .withColumn("n_pii", total)
            .withColumn("has_pii", F.col("n_pii") > 0))


def pii_oracle_sql(doc_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`pii_features` over ``doc_sql`` (a SELECT
    producing ``(id_col, text)``). DuckDB ``regexp_replace`` needs the
    explicit ``'g'`` flag to replace all occurrences (Spark's default)."""
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{rx}')) AS BIGINT) AS n_{name}"
        for name, rx, _ in PII_PATTERNS)
    red = "text"
    for _, rx, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{rx}', '{token}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
WITH d AS ({doc_sql}),
f AS (
  SELECT {id_col},
       {counts},
       {red} AS redacted
  FROM d)
SELECT {id_col}, n_email, n_phone, n_ssn, n_ipv4, redacted,
       {total} AS n_pii, ({total}) > 0 AS has_pii
FROM f ORDER BY {id_col}
"""
