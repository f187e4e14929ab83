"""Text-analysis operators for training-data pipelines (extension surface):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Column expressions — map-only projections that
pipeline with the scan at any scale (no shuffle, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny function-word list for the n-gram/stopword language heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are",
    "for", "on", "with", "as", "by", "at", "from", "this", "that", "it",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and single
    punctuation marks. Regex kept to the portable subset (identical in Java
    regex and DuckDB's RE2)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^A-Za-z0-9 ]")) / F.greatest(
        F.length(text), F.lit(1)
    )


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards stopword
    presence and moderate word length, penalizes punctuation soup and
    ultra-short docs. Weights are fixed, documented constants."""
    length_ok = F.when(F.length(text) >= 50, F.lit(1.0)).otherwise(
        F.length(text) / F.lit(50.0)
    )
    sw = stopword_ratio(text)
    sw_ok = F.least(sw * F.lit(4.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    wl = mean_word_length(text)
    wl_ok = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.25) * length_ok
        + F.lit(0.25) * sw_ok
        + F.lit(0.25) * punct_ok
        + F.lit(0.25) * wl_ok,
        6,
    )


def language_id(text: Column) -> Column:
    """Stopword-overlap language heuristic: 'en' when enough function words
    hit, else 'und'. (A real n-gram profile model slots in the same shape —
    per-language score columns + greatest().)"""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("und"))


def fingerprint(text: Column, ngram: int = 5) -> Column:
    """Winnowing-style document fingerprint: minimum md5 over word n-grams
    (k=1 MinHash). Near-identical docs that share any n-gram window of the
    minimum hash collide; robust to small edits unlike whole-doc hashing."""
    words = F.split(F.trim(text), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - ngram, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(words, i + k + 1) for k in range(ngram)])
        ),
    )
    return F.coalesce(F.array_min(grams), F.md5(text))
