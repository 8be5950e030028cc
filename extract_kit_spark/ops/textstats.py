"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All four stay entirely in JVM-side built-in expressions (whole-stage
codegen; no Python in the hot path), so they scale linearly with the
scan and each has an exact DuckDB oracle twin in `__spark_entry__`.

Determinism notes: fingerprints use md5 over whitespace-normalized
lowered text (identical semantics in Spark and DuckDB); ratios are
rounded to 6 decimals so cross-engine double formatting can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# fixed stopword lists (deterministic, tiny; broadcast as literals)
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as")
FR_STOPWORDS = ("le", "la", "les", "un", "une", "des", "et", "ou", "de",
                "du", "est", "que", "pour", "dans", "avec")

_PUNCT_RE = "[.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (split('')
    would yield [''])."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def normalized(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text. (The rolling-hash
    variant lives in dedup.simhash; this is the exact-dedup key.)"""
    return F.md5(normalized(col))


def _count_in(arr: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(
        arr, lambda w: w.isin(*[F.lit(x) for x in words])))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_calc, n_tokens, punct_ratio, stopword_ratio,
    quality_score, fingerprint, lang_pred. Pure built-ins."""
    c = F.col(text_col)
    toks = tokens(F.lower(c))
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = F.size(F.split(c, _PUNCT_RE)) - 1
    en = _count_in(toks, EN_STOPWORDS)
    fr = _count_in(toks, FR_STOPWORDS)
    punct_ratio = F.round(
        F.when(n_chars > 0, n_punct.cast("double") / n_chars)
        .otherwise(F.lit(0.0)), 6)
    stop_ratio = F.round(
        F.when(n_tok > 0, (en + fr).cast("double") / n_tok)
        .otherwise(F.lit(0.0)), 6)
    # quality: length signal x penalty for punctuation soup; bounded [0,1]
    quality = F.round(
        F.least(F.lit(1.0), n_tok.cast("double") / F.lit(50.0))
        * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 5))
        * (F.lit(1.0) - F.least(F.lit(1.0), stop_ratio)), 6)
    lang_pred = (F.when(fr > en, F.lit("fr"))
                 .when(en > fr, F.lit("en"))
                 .otherwise(F.lit("und")))
    return (df
            .withColumn("n_chars_calc", n_chars)
            .withColumn("n_tokens", n_tok)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("quality_score", quality)
            .withColumn("fingerprint", fingerprint(c))
            .withColumn("lang_pred", lang_pred))
