"""Text-analysis expression library for the documents pipeline:
token counting, quality scoring, language-ID heuristics, document
fingerprinting, shingling.

Everything is a built-in-expression Column builder (whole-stage
codegen, no Python) — the same design rule as the reference's scalar
kernels (SURVEY.md §2.8): per-row math as vectorized expressions. The
regex/arithmetic subset used here is portable between Spark and DuckDB
so every operator keeps an exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Word-splitting convention shared with the oracles: single-space split.
# (Documents are single-spaced; a \\s+ regex split would differ on
# leading/trailing whitespace between engines.)


def words(text: Column) -> Column:
    return F.split(text, " ")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count: regexp_count of \\S+ runs."""
    return F.regexp_count(text, F.lit(r"\S+"))


# BPE-ish pre-tokenizer: letter runs | digit runs | single symbol —
# the shape of a byte-pair-encoding pre-split, portable regex subset.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(BPE_PATTERN))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))


# Tiny per-language stopword lists for the heuristic language scorer.
# Chosen from the five langs present in the documents table.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "es": ("el", "la", "los", "y", "es", "un", "de"),
    "fr": ("le", "la", "les", "et", "est", "un", "dans"),
    "zh": ("de", "le", "shi", "bu", "zai", "you", "he"),
}


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """# words that are in the stopword list (array filter, JVM-side)."""
    return F.size(
        F.filter(words(F.lower(text)), lambda w: w.isin(*stopwords))
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1], null text -> null: length band +
    punctuation sanity + English-stopword presence + mean-word-length
    band. Deterministic arithmetic only (the web-text analog of the
    reference's plausibility-rule filter, clean_data.py:140-148).

    The null guard is load-bearing: without it, a null text's null
    stop_ratio is SKIPPED by least(null, 1.0) — null-skipping least is
    both Spark's and DuckDB's semantics — handing the one component a
    missing document cannot have its full 0.25 credit."""
    n_chars = F.length(text)
    n_words = ws_token_count(text)
    punct_ratio = punct_count(text) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stopword_hits(text, LANG_STOPWORDS["en"]) / F.greatest(
        n_words, F.lit(1)
    )
    mean_word_len = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    word_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(
        0.0
    )
    stop_part = F.least(stop_ratio * 5, F.lit(1.0))
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.round((len_ok + punct_ok + word_ok + stop_part) / 4.0, 4)
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit counts (the n-gram-free heuristic)."""
    return [
        (lang, stopword_hits(text, sw)) for lang, sw in sorted(LANG_STOPWORDS.items())
    ]


def guessed_lang_from_scores(scores: dict[str, Column]) -> Column:
    """argmax over language scores, ties -> lexicographically first
    lang, all-zero -> 'und' (deterministic; same CASE order as the
    oracle twin)."""
    items = sorted(scores.items())
    best = F.greatest(*[s for _, s in items])
    expr = F.lit("und")
    # build reversed when-chain so earlier langs win ties
    for lang, s in reversed(items):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def guessed_lang(text: Column) -> Column:
    return guessed_lang_from_scores(dict(lang_scores(text)))


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def content_fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def word_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-word shingles (the MinHash/Jaccard unit). Docs with
    fewer than k words yield an empty array (never a descending
    F.sequence)."""
    w = words(text)
    n = F.size(w)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.array_join(F.slice(w, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def min_shingle_fingerprint(text: Column, k: int = 5) -> Column:
    """Winnowing-flavored fingerprint: lexicographic min of the md5s of
    all k-word shingles (a 1-permutation MinHash)."""
    return F.array_min(F.transform(word_shingles(text, k), F.md5))
