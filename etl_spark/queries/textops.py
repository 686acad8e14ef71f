"""Text-analysis queries over the documents table — token counting,
quality scoring, language-ID heuristic, document fingerprinting
(the training-data-pipeline text operators).

Spark side: etl_spark/functions/text.py expression builders (pure
JVM). Oracle side: the identical arithmetic in DuckDB SQL — the
stopword lists and regexes are shared constants.

All four analyses are exposed as ONE ``text_profile`` query: they share
a single scan of ``documents`` (one pass, column-pruned to (doc_id,
text, lang)), which is both the shape a real profiling pipeline uses at
100 TB (never re-read the corpus per metric) and keeps the registry
within the driver's per-round query budget.
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


_LANGS = sorted(X.LANG_STOPWORDS)
_BEST = "greatest(" + ", ".join(f"s_{l}" for l in _LANGS) + ")"
_CASE = "CASE WHEN " + _BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{l} = {_BEST} THEN '{l}'" for l in _LANGS
) + " END"


# ---------------------------------------------------------------------------
# Token stats + quality score + language ID + fingerprints, one scan.
# Each column family cites its SURVEY slot:
#   n_ws_tokens / n_bpe_tokens / n_punct / n_chars — token counting
#     (whitespace + BPE-ish regex pre-tokenization), all regexp_count
#     (JVM, codegen).
#   quality — heuristic score in [0,1]: length band, punctuation sanity,
#     mean-word-length band, stopword presence (the web-text analog of
#     the reference's plausibility filter, clean_data.py:140-148).
#   guessed_lang / best_score — stopword-hit language ID: argmax over
#     per-language scores, deterministic lexicographic tiebreak,
#     all-zero -> 'und'.
#   content_md5 / min_shingle_md5 — exact content hash (md5 of
#     normalized text) + winnowing-flavored min-shingle hash
#     (lexicographic min of 5-word-shingle md5s, a 1-perm MinHash).
# ---------------------------------------------------------------------------
@query(
    "text_profile",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id, lang AS labeled_lang, text,
             string_split(text, ' ') AS words,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
             len(regexp_extract_all(lower(text), '{X.BPE_PATTERN}')) AS n_bpe_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
             {", ".join(f"{_sql_hits(l)} AS s_{l}" for l in _LANGS)}
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           n_ws_tokens, n_bpe_tokens, n_punct, n_chars,
           CASE WHEN text IS NULL THEN NULL ELSE ROUND((
             (CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN n_punct / greatest(n_chars, 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (n_chars - (n_ws_tokens - 1)) / greatest(n_ws_tokens, 1) >= 2.0
                    AND (n_chars - (n_ws_tokens - 1)) / greatest(n_ws_tokens, 1) <= 12.0
               THEN 1.0 ELSE 0.0 END)
           + least(s_en / greatest(n_ws_tokens, 1) * 5, 1.0)
           ) / 4.0, 4) END AS quality,
           {_CASE} AS guessed_lang,
           {_BEST} AS best_score,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_md5,
           list_aggregate(
             list_transform(range(1, greatest(len(words) - 3, 1)),
                            i -> md5(array_to_string(words[i:i+4], ' '))),
             'min') AS min_shingle_md5
    FROM m
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All text-analysis operators fused over one column-pruned scan:
    token counting, quality scoring, language ID, fingerprinting. At
    corpus scale this is the only sane shape — profile columns are
    computed together, per pass, entirely in whole-stage codegen (zero
    Python on the data path)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lang: s for lang, s in X.lang_scores(t)}
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.ws_token_count(t).alias("n_ws_tokens"),
        X.bpe_token_count(t).alias("n_bpe_tokens"),
        X.punct_count(t).alias("n_punct"),
        F.length(t).alias("n_chars"),
        X.quality_score(t).alias("quality"),
        X.guessed_lang_from_scores(scores).alias("guessed_lang"),
        F.greatest(*scores.values()).alias("best_score"),
        X.content_fingerprint(t).alias("content_md5"),
        X.min_shingle_fingerprint(t, k=5).alias("min_shingle_md5"),
    )
