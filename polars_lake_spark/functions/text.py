"""Text-analysis column functions for training-data pipelines.

All pure built-in expressions (whole-stage codegen, no Python UDFs):
language-ID heuristic, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# n-gram-marker language heuristic: surface markers per language checked in
# a fixed order (deterministic CASE).
LANG_MARKERS = [
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " la ", " et "]),
    ("es", [" el ", " los ", " y "]),
    ("en", [" the ", " and ", " is "]),
]

# BPE-ish token pattern: letter runs, digit runs, single other non-space.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[^.,!?;:]"


def normalized(col) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col) -> Column:
    return F.split(normalized(col), " ")


def word_count(col) -> Column:
    return F.size(words(col))


def avg_word_len(col) -> Column:
    w = words(col)
    # characters excluding separators / word count
    return F.length(F.regexp_replace(normalized(col), " ", "")) / F.size(w)


def stopword_ratio(col) -> Column:
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return hits / F.size(w)


def punct_ratio(col) -> Column:
    return F.length(F.regexp_replace(col, PUNCT_CLASS, "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: longer docs up to ~100 words are
    better, punctuation-noise is penalized, stopword presence rewarded."""
    return (
        F.least(F.lit(1.0), word_count(col) / F.lit(100.0))
        * (1 - punct_ratio(col))
        * (0.5 + 0.5 * F.least(F.lit(1.0), stopword_ratio(col) * 5))
    )


def lang_id(col) -> Column:
    """Marker-word language guess; 'und' (undetermined) when nothing hits."""
    padded = F.concat(F.lit(" "), normalized(col), F.lit(" "))
    expr = None
    guess = F.lit("und")
    for lang, markers in reversed(LANG_MARKERS):
        cond = None
        for m in markers:
            c = padded.contains(m)
            cond = c if cond is None else (cond | c)
        guess = F.when(cond, lang).otherwise(guess)
        expr = guess
    return expr


def ws_token_count(col) -> Column:
    return F.size(words(col))


def bpe_token_count(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def subword_estimate(col) -> Column:
    """The classic chars/4 token estimate."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("bigint")


def fingerprint_md5(col) -> Column:
    return F.md5(normalized(col).cast("binary"))


def fingerprint_sha256(col) -> Column:
    return F.sha2(normalized(col).cast("binary"), 256)


def fingerprint_prefix(col, n: int = 12) -> Column:
    """Short fingerprint for bucketing/joining at scale."""
    return F.substring(fingerprint_md5(col), 1, n)
