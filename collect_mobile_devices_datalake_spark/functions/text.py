"""Text-analysis scalar operators for the training-data pipeline.

All built-in expressions (codegen'd, no Python in the hot path) so they
hold up on a 100 TB documents table: tokenization is a single regexp
split, n-grams are ``transform`` over index ``sequence``s, ratios are
regexp-count arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small function-word lists per language for the n-gram/stopword language
# heuristic. Deliberately tiny: the point is a cheap JVM-side filter, not a
# real langid model.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "he", "ren", "ta"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → ``array<string>`` (empty array for blank)."""
    c = F.trim(_c(col))
    return F.when(c == "", F.array().cast("array<string>")).otherwise(F.split(c, "\\s+"))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries.

    A BPE-flavored upper estimate: every word, number run, and punctuation
    mark counts; long words count once per 4 chars (roughly how BPE breaks
    rare words into pieces).
    """
    c = _c(col)
    words = F.split(F.trim(c), "\\s+")
    word_pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.length(F.regexp_replace(c, "[^\\p{Punct}]", ""))
    return word_pieces + punct


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty)."""
    c = _c(col)
    n = F.length(c)
    p = F.length(F.regexp_replace(c, "[^\\p{Punct}]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are function words of ``lang``."""
    toks = tokens(col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Blend of length band (50..5000 chars), moderate punctuation, and
    English-stopword presence — the standard pre-training quality filters
    (length / symbol ratio / stopword ratio) as one codegen'd expression.
    """
    c = _c(col)
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n == 0, F.lit(0.0)).otherwise(F.lit(0.5))
    )
    punct_ok = F.when(punct_ratio(c) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    sw_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_ok + punct_ok + sw_ok) / F.lit(3.0)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams (space-joined) → ``array<string>``; empty if < n tokens."""
    toks = tokens(col)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def word_ngrams_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Word n-grams over an ALREADY-materialized token-array column —
    the checkpoint-friendly sibling of ``word_ngrams``, whose inline
    tokenize re-splits the text once per position when its result is
    consumed element-wise (the CollapseProject HOF trap, O(words²)).
    Callers materialize the token array (localCheckpoint) and pass the
    attribute here; empty array when fewer than ``n`` tokens. One
    definition for every shingling site (winnowing, MinHash shingles),
    so a tokenization fix cannot diverge between them."""
    t = _c(toks)
    count = F.size(t) - F.lit(n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles → ``array<string>``; empty if < n chars."""
    c = _c(col)
    count = F.length(c) - F.lit(n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), count), lambda i: F.substring(c, i, n))
    )


def rolling_hash(col: Column | str, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Deterministic polynomial rolling hash of a string → int64.

    Pure arithmetic (``aggregate`` over char codes) so the same value is
    reproducible in any engine — used for document fingerprinting and as
    the shingle hash inside MinHash. Never overflows: acc < mod ≈ 1e9 and
    acc*base + 255 < 9.2e18.
    """
    c = _c(col)
    idx = F.sequence(F.lit(1), F.length(c))
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            idx,
            F.lit(0).cast("long"),
            lambda acc, i: (acc * base + F.ascii(F.substring(c, i, 1))) % mod,
        )
    )
