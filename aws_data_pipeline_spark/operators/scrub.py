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


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """Per-combination k-anonymity audit over quasi-identifier columns:
    each (quasi-tuple) with its row count and an ``at_risk`` flag when
    fewer than ``k`` rows share it — the re-identification risk measure
    that text-level PII scrubbing cannot see (scrubbing removes direct
    identifiers; a unique nation+segment+birth-year COMBINATION
    re-identifies without any of them). Flags are data, the DQ stance:
    the release decision reads this frame. One grouped count — the
    fact's single shuffle — and an exact-integer comparison, so the risk
    set is bit-identical across engines."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").alias("n_rows")
    ).withColumn("at_risk", F.col("n_rows") < F.lit(int(k)))


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """Suppression-based k-anonymity enforcement: drop every row whose
    quasi-identifier combination has fewer than ``k`` peers, so each
    released row hides among at least k-1 others. Suppression (not
    generalization) keeps the operator deterministic and value-exact —
    generalization hierarchies are a policy input, and a wrong hierarchy
    silently under-anonymizes; rows removed here are recoverable from
    the source zone. Shape: the audit's grouped count joined back as a
    semi-join on the safe combinations — two shuffles on the quasi key,
    no broadcast assumption (quasi-cardinality is data-dependent, AQE
    decides)."""
    safe = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= F.lit(int(k)))
        .select(*quasi_cols)
    )
    return df.join(safe, list(quasi_cols), "left_semi")
