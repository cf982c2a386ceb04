"""Text-analysis column functions for training-data pipelines.

Everything here is a pure Catalyst column expression (JVM,
whole-stage-codegen) — no Python in the hot path. Each has a matching
relational query + DuckDB oracle in :mod:`sitemapper_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count_col",
    "stopword_ratio_col",
    "punct_ratio_col",
    "quality_score_col",
    "lang_id_col",
    "fingerprint_col",
]

_EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "that", "for"]
_ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "los", "del"]
_FR_STOPWORDS = ["le", "la", "de", "et", "les", "des", "en", "du"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def _occurrences(padded: Column, word: str) -> Column:
    """# of ' word ' occurrences via length arithmetic (JVM-only)."""
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, f" {word} ", "|")))
        / (len(word) + 1)
    ).cast("long")


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(text), F.lit(" "))


def stopword_hits_col(text: Column, stopwords: list[str] | None = None) -> Column:
    p = _padded(text)
    words = stopwords or _EN_STOPWORDS
    total = _occurrences(p, words[0])
    for w in words[1:]:
        total = total + _occurrences(p, w)
    return total


def stopword_ratio_col(text: Column) -> Column:
    """English stopword hits per token — high for natural prose."""
    return stopword_hits_col(text) / F.greatest(token_count_col(text), F.lit(1))


def punct_ratio_col(text: Column) -> Column:
    """Punctuation chars per char."""
    stripped = F.regexp_replace(text, r"[\.,;:!\?]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score_col(text: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    mid-length docs with sentence punctuation and stopword structure —
    the usual cheap pre-filter before expensive model scoring."""
    n_tok = token_count_col(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio_col(text) * 4, F.lit(1.0))
    punct = punct_ratio_col(text)
    punct_score = F.when(punct > 0.1, F.lit(0.2)).otherwise(F.lit(1.0))
    return F.round((len_score + stop_score) / 2 * punct_score, 4)


def lang_id_col(text: Column) -> Column:
    """Stopword-vote language ID over {en, es, fr}, 'other' on ties/0.

    N-gram-free heuristic chosen to be SQL-expressible for the oracle;
    a production pipeline would swap a fastText-style model in via the
    same column contract.
    """
    en = stopword_hits_col(text, _EN_STOPWORDS)
    es = stopword_hits_col(text, _ES_STOPWORDS)
    fr = stopword_hits_col(text, _FR_STOPWORDS)
    return (
        F.when((en > es) & (en > fr), F.lit("en"))
        .when((es > en) & (es > fr), F.lit("es"))
        .when((fr > en) & (fr > es), F.lit("fr"))
        .otherwise(F.lit("other"))
    )


def fingerprint_col(text: Column, n_grams: int = 4) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct word n-grams (a winnowing-style rolling fingerprint
    without the Python rolling loop — the gram set is the roll). md5
    rather than xxhash64 so the DuckDB oracle can recompute the exact
    value (xxhash64 has no DuckDB twin)."""
    tokens = F.filter(F.split(F.lower(text), r"[^\p{L}\p{N}]+"), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - n_grams, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n_grams)),
    )
    return F.md5(F.concat_ws("|", F.array_sort(F.array_distinct(grams))))
