"""Text analysis for crawl corpora: language ID, quality scoring, token
counting, fingerprinting — all as JVM-side column expressions (no Python
in the hot path; SURVEY.md §2.8 mapping of the C-category plus the
training-data-pipeline additions).

Each builder returns Columns composable into any pipeline; the
DuckDB-oracled variants live in queries.py. Language ID is a stopword
n-gram heuristic: score each candidate language by the fraction of
tokens in its marker set, pick the argmax (ties break lexicographically
— deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker lexicons: enough signal for corpus routing, zero deps
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "que"),
    "es": ("el", "la", "que", "de", "los", "una", "es", "por"),
}

STOPWORDS_EN = ("a", "the", "and", "of", "to")


def tokens_col(text: Column) -> Column:
    """Lowercased alnum tokens (empty strings filtered)."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def lang_scores_col(text: Column) -> Column:
    """MAP<lang, double>: marker-token hit ratio per language."""
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            (
                F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("double") / n
            ).alias("score"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def lang_id_col(text: Column, min_score: float = 0.05) -> Column:
    """Argmax language, 'unknown' when no language clears min_score."""
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    best = None
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        score = F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("double") / n
        cand = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(cand["score"] > best["score"], cand).otherwise(best)
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(F.lit("unknown"))


def stopword_ratio_col(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("double") / n


def distinct_ratio_col(text: Column) -> Column:
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    return F.size(F.array_distinct(toks)).cast("double") / n


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality: length band + lexical diversity +
    some-but-not-all stopwords (the classic boilerplate/gibberish gate)."""
    n = token_count_col(text)
    len_ok = F.when((n >= 10) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    div = distinct_ratio_col(text)
    stop = stopword_ratio_col(text)
    stop_ok = F.when((stop > 0.0) & (stop < 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + F.least(div * 2, F.lit(1.0)) + stop_ok) / 3.0, 4)


def fingerprint_col(text: Column) -> Column:
    """Normalized-content fingerprint (whitespace-insensitive md5)."""
    return F.md5(F.array_join(tokens_col(text), " "))


def ngrams_col(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of joined strings (for Jaccard /
    MinHash shingling). Pure higher-order functions, no UDF.

    r7 shape: built by zipping the token array against its own
    k-shifted suffixes (one ``slice`` per k, evaluated once per row)
    and folding with ``concat_ws``. The previous
    ``transform(sequence(...), i -> array_join(slice(toks, i+1, n)))``
    referenced the OUTER ``toks`` expression inside the lambda, which
    Catalyst re-evaluates — split + filter over the whole text — PER
    ELEMENT: O(tokens^2) work per row, measured 10x slower at sf1.0
    (34.8 s vs 3.6 s for the 3-gram pass over 50k documents). Output is
    identical: exactly size-n+1 full n-grams in order (the zip tail's
    partial grams are cut by the final slice), empty array when a row
    has fewer than n tokens."""
    toks = tokens_col(text)
    size = F.size(toks)
    grams = toks
    for k in range(2, n + 1):
        # zip_with pads the shorter side with null and concat_ws skips
        # nulls, so tail entries hold partial grams — sliced off below.
        grams = F.zip_with(
            grams,
            # length `size` == "to the end" (slice caps at the array
            # end; a literal INT_MAX would overflow start+length)
            F.slice(toks, k, size),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    if n == 1:
        return grams
    return F.when(size < n, F.array()).otherwise(
        F.slice(grams, 1, size - n + 1)
    )
