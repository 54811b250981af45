"""Text-analysis operators for LLM-data pipelines (north-star surface).

All JVM-side Column expressions (split/filter/transform/aggregate higher-order
functions) — zero Python in the hot path, so these run at parquet-scan speed
on 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword profiles for the language-ID heuristic.
# (Real profiles would be larger; the mechanism — per-language token-match
# scoring + argmax — is what the operator demonstrates.)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "fast", "slow"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "et", "est", "un", "une", "pas", "avec"),
    "es": ("el", "la", "y", "es", "un", "una", "no", "con"),
}

STOPWORDS = LANG_PROFILES["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization, lowercased."""
    return F.split(F.lower(text), " ")


def shingles(toks: Column, k: int = 5) -> Column:
    """Positional k-token shingles joined with spaces; distinct set.

    ``transform(sequence(...))`` over the token array — no explode until the
    caller wants one row per shingle, so the scan stays narrow.
    """
    raw = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(raw)).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(toks: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(lit_arr, x)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    subtoken count (alpha runs / digit runs / single symbols)."""
    t = tokens(F.col(text_col))
    subtok = F.regexp_extract_all(
        F.col(text_col), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0
    )
    return df.withColumns(
        {
            "n_tokens": F.size(t),
            "n_distinct_tokens": F.size(F.array_distinct(t)),
            "n_subtokens": F.size(subtok),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality scoring: length, stopword ratio, mean token
    length, alpha ratio -> [0,1] composite. Deterministic double arithmetic
    (identical expression tree on the oracle side)."""
    t = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(t)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    sw = stopword_count(t)
    mean_tok_len = alpha_chars / n_toks
    return df.withColumns(
        {
            "n_tokens": n_toks,
            "stopword_ratio": sw / n_toks,
            "alpha_ratio": alpha_chars / n_chars,
            "mean_token_len": mean_tok_len,
            "quality_score": (
                F.least(F.lit(1.0), n_toks / F.lit(100.0)) * 0.4
                + (sw / n_toks) * 0.3
                + F.least(F.lit(1.0), mean_tok_len / F.lit(8.0)) * 0.3
            ),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-profile language ID: score each language by profile
    token matches, argmax with a deterministic tie-break on language code.

    (The synthetic corpus draws from one vocabulary for every ``lang`` label,
    so this demonstrates the mechanism, not label recovery.)
    """
    t = tokens(F.col(text_col))
    scored = F.array(
        *[
            F.struct(
                stopword_count(t, words).alias("score"),
                F.lit(code).alias("code"),
            )
            for code, words in sorted(LANG_PROFILES.items())
        ]
    )
    # argmax: entries with the max score, alphabetically first code on ties
    max_score = F.array_max(F.transform(scored, lambda s: s["score"]))
    best_code = F.array_min(
        F.transform(
            F.filter(scored, lambda s: s["score"] == max_score),
            lambda s: s["code"],
        )
    )
    return df.withColumns({"lang_score": max_score, "predicted_lang": best_code})


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    order-insensitive, whitespace-normalized document identity."""
    t = tokens(F.col(text_col))
    return df.withColumn(
        "fingerprint",
        F.md5(F.array_join(F.array_sort(F.array_distinct(t)), "|")),
    )
