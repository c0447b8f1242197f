"""PII detection and redaction: emails, IPv4 addresses, phone-like
numbers.

Standard web-corpus hygiene (the regex family Common-Crawl-derived
pipelines apply before training): count and replace personally
identifying spans with typed placeholder tokens. Everything is native
``regexp_count`` / ``regexp_replace`` — JVM regex inside whole-stage
codegen, no Python in the row path.

The patterns deliberately use only syntax shared by Java regex and RE2
(no lookarounds, no backreferences) so the DuckDB oracle replicates them
verbatim; redaction order is fixed (email, then IP, then phone) because
the classes can overlap and order changes the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

# fixed application order — classes overlap (an email's host can contain
# digits and dots; a redacted line must not re-match)
PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, n_email, n_ip, n_phone): per-doc PII span counts.
    Counts follow the same sequential-redaction view as :func:`redact_pii`
    (each class is counted on the text with the previous classes already
    replaced), so n_* sums to the number of placeholders redact emits."""
    # NULL text counts as zero PII spans, not NULL counts (a downstream
    # sum/filter must not silently skip/drop the doc)
    out = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    counts = []
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col("_t"), F.lit(pat)).cast("long")
        )
        out = out.withColumn("_t", F.regexp_replace("_t", pat, repl))
        counts.append(f"n_{name}")
    return out.select("id", *counts)


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> input columns with ``text_col`` replaced by its redacted form
    (typed placeholders), applied in the fixed PII_PATTERNS order."""
    col = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(text_col, col)
