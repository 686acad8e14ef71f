"""Text-analysis queries over the documents table — token counting,
quality scoring, language-ID heuristic, document fingerprinting
(the training-data-pipeline text operators).

Spark side: etl_spark/functions/text.py expression builders (pure
JVM). Oracle side: the identical arithmetic in DuckDB SQL — the
stopword lists and regexes are shared constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.functions import text as X
from etl_spark.queries import query
from etl_spark.sources.readers import load_table


def _sql_list(wordlist) -> str:
    return "[" + ", ".join(f"'{w}'" for w in wordlist) + "]"


def _sql_hits(lang: str) -> str:
    return (
        "len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains({_sql_list(X.LANG_STOPWORDS[lang])}, w)))"
    )


# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=rf"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '{X.BPE_PATTERN}')) AS n_bpe_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pre-tokens +
    punctuation count, all regexp_count (JVM, codegen)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        X.ws_token_count(t).alias("n_ws_tokens"),
        X.bpe_token_count(t).alias("n_bpe_tokens"),
        X.punct_count(t).alias("n_punct"),
        F.length(t).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '\S+')) AS n_words,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
             {_sql_hits("en")} AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           ROUND((
             (CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN n_punct / greatest(n_chars, 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (n_chars - (n_words - 1)) / greatest(n_words, 1) >= 2.0
                    AND (n_chars - (n_words - 1)) / greatest(n_words, 1) <= 12.0
               THEN 1.0 ELSE 0.0 END)
           + least(stop_hits / greatest(n_words, 1) * 5, 1.0)
           ) / 4.0, 4) AS quality
    FROM m
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score in [0,1] — length band, punctuation
    sanity, mean-word-length band, stopword presence (the web-text
    analog of the reference's plausibility filter, clean_data.py:140-148).
    A real pipeline filters on this; here the score itself is checked."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", X.quality_score(F.col("text")).alias("quality"))


# ---------------------------------------------------------------------------
_LANGS = sorted(X.LANG_STOPWORDS)
_BEST = "greatest(" + ", ".join(f"s_{l}" for l in _LANGS) + ")"
_CASE = "CASE WHEN " + _BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{l} = {_BEST} THEN '{l}'" for l in _LANGS
) + " END"


@query(
    "text_lang_guess",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS labeled_lang,
             {", ".join(f"{_sql_hits(l)} AS s_{l}" for l in _LANGS)}
      FROM documents
    )
    SELECT doc_id, labeled_lang, {_CASE} AS guessed_lang,
           {_BEST} AS best_score
    FROM scores
    """,
)
def text_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: argmax over per-language scores with a
    deterministic lexicographic tiebreak, all-zero -> 'und'."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scores = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[s.alias(f"s_{lang}") for lang, s in X.lang_scores(t)],
    )
    best = F.greatest(*[F.col(f"s_{l}") for l in _LANGS])
    return scores.select(
        "doc_id",
        "labeled_lang",
        X.guessed_lang_from_scores(
            {l: F.col(f"s_{l}") for l in _LANGS}
        ).alias("guessed_lang"),
        best.alias("best_score"),
    )


# ---------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, text, string_split(text, ' ') AS words
      FROM documents
    )
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_md5,
           list_aggregate(
             list_transform(range(1, greatest(len(words) - 3, 1)),
                            i -> md5(array_to_string(words[i:i+4], ' '))),
             'min') AS min_shingle_md5
    FROM w
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash (md5 of normalized
    text) + a winnowing-flavored min-shingle hash (lexicographic min of
    5-word-shingle md5s — a 1-permutation MinHash)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        X.content_fingerprint(t).alias("content_md5"),
        X.min_shingle_fingerprint(t, k=5).alias("min_shingle_md5"),
    )
