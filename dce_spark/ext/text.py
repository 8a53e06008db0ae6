"""Text analysis operators over a document table.

All pure Column expressions (JVM-side, whole-stage codegen) — no UDFs:
tokenization, token/char statistics, stopword & punctuation ratios, a
quality score, a language heuristic, and document fingerprinting
(normalized-text hash). At 100 TB these are embarrassingly parallel
map-side operators: no shuffle at all unless aggregated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokens_col",
    "token_count_col",
    "regex_token_count_col",
    "stopword_ratio_col",
    "punct_ratio_col",
    "quality_score_col",
    "fingerprint_col",
    "text_stats",
    "text_quality",
]

# tiny multilingual stopword lists for the language-id heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "en", "que", "pour", "dans", "les"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "den", "ist"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def regex_token_count_col(text: Column, pattern: str = BPE_REGEX) -> Column:
    """Token count under a BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    stops = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    n = F.size(toks)
    return F.when(n > 0, stops / n).otherwise(F.lit(0.0))


def punct_ratio_col(text: Column) -> Column:
    no_punct = F.regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    n = F.length(text)
    return F.when(n > 0, (n - F.length(no_punct)) / n).otherwise(F.lit(0.0))


def quality_score_col(text: Column, lang: str = "en") -> Column:
    """Heuristic document quality in [0, 1]: length signal x low-punct
    signal x stopword-presence signal (the usual cheap pretraining
    filters: too-short, symbol-heavy, and no-function-word docs score
    low)."""
    n_tokens = token_count_col(text)
    length_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(text) * 4)
    stop_score = F.least(stopword_ratio_col(text, lang) * 5, F.lit(1.0))
    return length_score * punct_score * stop_score


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text."""
    normalized = F.lower(F.trim(F.regexp_replace(text, "\\s+", " ")))
    return F.md5(normalized.cast("binary"))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    n_tokens = token_count_col(t)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        regex_token_count_col(t).alias("n_bpe_tokens"),
        F.when(n_tokens > 0, F.length(t) / n_tokens)
        .otherwise(F.lit(0.0))
        .alias("chars_per_token"),
    )


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        stopword_ratio_col(t).alias("stopword_ratio"),
        punct_ratio_col(t).alias("punct_ratio"),
        quality_score_col(t).alias("quality_score"),
    )
