"""PII scrubbing for training-data curation (north-star surface; the
reference pipeline has no text handling at all — SURVEY.md §2.5).

All patterns are plain `regexp_replace` / `regexp_extract_all` Column
expressions — JVM-side, codegen-friendly, no UDF — and are written in the
common regex subset that Java (Spark) and RE2 (DuckDB oracle) interpret
identically, so every redaction count is oracle-checkable.

Replacement order matters: URLs first (they contain dots/digits that the
narrower patterns would otherwise chew on), then emails, then the numeric
identifiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token). Conservative on purpose: a scrubber
# that over-matches destroys training text; under-matching is recoverable by
# adding patterns.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # the last URL char must not be closing/sentence punctuation: a bare
    # [^\s]+ chews the ')' of '(https://a.com)' and the ',' after it,
    # unbalancing every markdown link and parenthesized citation in the
    # training text. [^\s]* then one non-punct char backtracks to the
    # real end; RE2-safe (no lookaround), so the DuckDB twin matches.
    ("url", r"""(https?://[^\s]*[^\s).,;:!?'"\]>])""", "<URL>"),
    ("email", r"([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})", "<EMAIL>"),
    ("ssn", r"(\b\d{3}-\d{2}-\d{4}\b)", "<SSN>"),
    ("phone", r"(\b\d{3}[-.]\d{3}[-.]\d{4}\b)", "<PHONE>"),
    ("ipv4", r"(\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b)", "<IP>"),
)


def redaction_counts(text: Column) -> dict[str, Column]:
    """Per-pattern match counts on the ORIGINAL text (counted before any
    replacement so counts are independent of scrub order)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 1))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_text(text: Column) -> Column:
    """Apply every redaction in order, returning the cleaned text."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Add `out_col` (scrubbed text), per-pattern `n_<name>` counts, and a
    total `n_redactions`. One narrow projection — runs at scan speed."""
    counts = redaction_counts(F.col(text_col))
    out = df.withColumn(out_col, scrub_text(F.col(text_col)))
    total = None
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c.cast("long"))
        total = c if total is None else total + c
    return out.withColumn("n_redactions", total.cast("long"))
