"""Deduplication queries over the documents table — the training-data
dedup families: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine. Operators live in etl_spark/operators/dedup_text.py
and operators/similarity.py; every oracle replicates the identical
hash arithmetic (md5 is md5 in every engine) so comparisons are exact,
including the LSH banding behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators import dedup_text as D
from etl_spark.operators.similarity import cosine_pairs
from etl_spark.queries import query
from etl_spark.sources.readers import load_table

JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.45

# Shared SQL fragments -------------------------------------------------------

# distinct 5-word shingles, exploded: (doc_id, n_grams, gram)
_GRAMS_CTE = """
  wordsets AS (
    SELECT doc_id,
           list_distinct(list_transform(
             range(1, greatest(len(string_split(text,' ')) - 3, 1)),
             i -> array_to_string(string_split(text,' ')[i:i+4], ' '))) AS grams
    FROM documents
  ),
  grams AS (
    SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
    FROM wordsets
  )
"""


# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_md5,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY content_md5
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-content md5 — one
    partial-aggregated shuffle of (hash, id); payloads never move.
    Null text is excluded on both twins (a null-hash group would lump
    every failed extraction into one 'duplicate' set)."""
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dup_groups(d, "doc_id", "text")


# ---------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_GRAMS_CTE},
    kept AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING COUNT(*) <= {D.DEFAULT_MAX_DOC_FREQ}
    ),
    capped AS (
      SELECT g.doc_id, g.gram FROM grams g JOIN kept USING (gram)
    ),
    counts AS (
      -- per-doc counts over the CAPPED universe: the denominator must
      -- see the same shingle set the intersection can see
      SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a_id, b_id
    )
    SELECT a_id, b_id, n_common,
           ROUND(n_common / (ca.n + cb.n - n_common), 4) AS jaccard
    FROM pairs
    JOIN counts ca ON ca.doc_id = a_id
    JOIN counts cb ON cb.doc_id = b_id
    WHERE n_common / (ca.n + cb.n - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-word-shingle Jaccard >= 0.8 pairs via shingle equi-join (the
    theta-join-to-equi-join rewrite, SURVEY.md J6) with the default
    doc-frequency cap on stopword shingles — Jaccard computed over the
    capped shingle universe on both sides of the fraction (the oracle
    replicates cap AND recount, so the guarded plan is what is
    verified). The exact baseline the MinHash variant approximates."""
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", k=5, threshold=JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
_MH = ",\n           ".join(
    "MIN(substr(md5('{b}|' || gram), {p}, 8)) AS mh{i}".format(
        b=D.minhash_slice(i)[0], p=D.minhash_slice(i)[1], i=i
    )
    for i in range(D.N_HASHES)
)
_BANDS_SQL = "\n      UNION ALL\n".join(
    "      SELECT doc_id, n_grams, {b} AS band, ".format(b=b)
    + " || '#' || ".join(f"mh{b * 4 + r}" for r in range(4))
    + " AS sig FROM sigs"
    for b in range(D.N_BANDS)
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_GRAMS_CTE},
    sigs AS (
      SELECT doc_id, n_grams,
           {_MH}
      FROM grams GROUP BY doc_id, n_grams
    ),
    banded AS (
{_BANDS_SQL}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.a_id, c.b_id, ga.n_grams AS a_n, gb.n_grams AS b_n,
             COUNT(*) AS n_common
      FROM cands c
      JOIN grams ga ON ga.doc_id = c.a_id
      JOIN grams gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
      GROUP BY c.a_id, c.b_id, a_n, b_n
    )
    SELECT a_id, b_id,
           ROUND(n_common / (a_n + b_n - n_common), 4) AS jaccard
    FROM verified
    WHERE n_common / (a_n + b_n - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 salted-md5 permutations) -> 4-band LSH bucketing ->
    exact-Jaccard verification of candidates only. The oracle replicates
    the same signatures and bands, so even the approximate candidate
    set must match bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, "doc_id", "text", k=5, threshold=JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
def _bit_sql(j: int) -> str:
    """±1 contribution of bit j of md5(tok) — same arithmetic as
    operators/dedup_text._bit_of_md5."""
    pos = 1 + j // 4
    shift = 2 ** (3 - j % 4)
    return (
        f"(floor((strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1) "
        f"/ {shift})::BIGINT % 2) * 2 - 1"
    )


_SIM_SUMS = ",\n             ".join(
    f"SUM({_bit_sql(j)}) AS s{j}" for j in range(D.SIMHASH_BITS)
)
_SIM_BITS = ", ".join(
    f"CASE WHEN s{j} > 0 THEN 1 ELSE 0 END" for j in range(D.SIMHASH_BITS)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, md5(unnest(list_distinct(string_split(lower(text), ' ')))) AS h
      FROM documents
    ),
    sums AS (
      SELECT doc_id,
             {_SIM_SUMS}
      FROM toks GROUP BY doc_id
    ),
    fps AS (
      SELECT doc_id, [{_SIM_BITS}] AS bits FROM sums
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           list_sum(list_transform(range(1, 65),
                    i -> abs(a.bits[i] - b.bits[i])))::BIGINT AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE list_sum(list_transform(range(1, 65),
                   i -> abs(a.bits[i] - b.bits[i]))) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (Hamming <= 3) via 4-chunk banding
    + exact verify. Full recall by pigeonhole (<=3 differing bits can
    dirty at most 3 of 4 chunks), which is why the banded Spark plan
    must equal the all-pairs SQL oracle exactly."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(d, "doc_id", "text", max_hamming=3)


# ---------------------------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i]))))
             AS cos_raw
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, ROUND(cos_raw, 4) AS cosine
    FROM scored WHERE cos_raw >= {COSINE_THRESHOLD}
    """,
    # local-only since r4: the driver slots go to the scale paths
    # (dedup_embedding_blocked / dedup_embedding_ivf); this O(N^2)
    # baseline stays oracle-checked by the local parity suite.
    driver=False,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact cosine >= 0.45 over all (a<b)
    pairs — JVM higher-order-function fold, doubles end to end. This
    all-pairs form is the EXPLICIT O(N^2) baseline (the rerank kernel
    and the recall yardstick); the operator to copy for corpus-scale
    embedding dedup is dedup_embedding_blocked below, whose plan has no
    cartesian product."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(e, "vec_id", "embedding", threshold=COSINE_THRESHOLD)


# ---------------------------------------------------------------------------
# Blocked embedding dedup — the corpus-scale path: an LSH sign-signature
# blocking key first, so candidate pairing is an equi-join on the block
# (same shuffle shape as every other key join in the engine), exact
# cosine only inside blocks. Recall is the LSH trade; the oracle embeds
# the identical hyperplane literals, so the comparison is exact.
# ---------------------------------------------------------------------------


def _dedup_blocked_oracle() -> str:
    from etl_spark.queries.similarity import _SIG_SQL

    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, e, {_SIG_SQL} AS sig FROM v
    ),
    scored AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i]))))
             AS cos_raw
      FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, ROUND(cos_raw, 4) AS cosine
    FROM scored WHERE cos_raw >= {COSINE_THRESHOLD}
    """


@query("dedup_embedding_blocked", oracle=_dedup_blocked_oracle())
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with LSH-signature blocking: bucket =
    6-plane sign signature, pairs form only inside a bucket (equi-join,
    no CartesianProduct anywhere in the plan), exact cosine >= 0.45 as
    the in-bucket verify. At 10^10 vectors the block key bounds the
    join's fan-out to bucket size^2 instead of corpus^2 — the named
    operator for embedding dedup; dedup_embedding_cosine above is the
    all-pairs recall baseline."""
    from etl_spark.operators.similarity import lsh_signature
    from etl_spark.queries.similarity import LSH_PLANES

    e = load_table(spark, sf_dir, "embeddings")
    sigged = e.withColumn(
        "sig", lsh_signature(F.col("embedding").cast("array<double>"), LSH_PLANES)
    )
    return cosine_pairs(
        sigged, "vec_id", "embedding", threshold=COSINE_THRESHOLD, block_col="sig"
    )


# ---------------------------------------------------------------------------
# IVF embedding dedup — the full production ANN-dedup pipeline in one
# query: learn the coarse quantizer (deterministic Lloyd, the same
# index ann_ivf_topk oracle-checks), generate candidates by multi-probe
# (2 nearest cells per vector vs assigned cell), exact-cosine rerank.
# The oracle re-derives the entire chain — k-means, probe ranking,
# candidate set, rerank — in DuckDB CTE algebra.
# ---------------------------------------------------------------------------


def _dedup_ivf_oracle() -> str:
    from etl_spark.queries.similarity import (
        IVF_K,
        N_PROBES,
        _SQDIST,
        _V_CTE,
        _assign_cte,
        _update_cte,
    )

    return f"""
    WITH {_V_CTE},
    c0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS cell, e AS ce
      FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {IVF_K})
    ),
    {_assign_cte("v", "c0", "a0")},
    {_update_cte("a0", "c1")},
    {_assign_cte("v", "c1", "a1")},
    {_update_cte("a1", "c2")},
    {_assign_cte("v", "c2", "a2")},
    probe_d AS (
      SELECT p.vec_id, c.cell, {_SQDIST} AS dist
      FROM a2 p CROSS JOIN c2 c
    ),
    probes AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS prn
        FROM probe_d
      ) WHERE prn <= {N_PROBES}
    ),
    cand AS (
      SELECT DISTINCT LEAST(p.vec_id, c.vec_id) AS a_id,
                      GREATEST(p.vec_id, c.vec_id) AS b_id
      FROM probes p JOIN a2 c ON p.cell = c.cell AND p.vec_id <> c.vec_id
    ),
    reranked AS (
      SELECT cand.a_id, cand.b_id,
             list_sum(list_transform(range(1, 65), i -> va.e[i] * vb.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> va.e[i] * va.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> vb.e[i] * vb.e[i]))))
             AS cos_raw
      FROM cand
      JOIN v va ON va.vec_id = cand.a_id
      JOIN v vb ON vb.vec_id = cand.b_id
    )
    SELECT a_id, b_id, ROUND(cos_raw, 4) AS cosine
    FROM reranked WHERE cos_raw >= {COSINE_THRESHOLD}
    """


@query("dedup_embedding_ivf", oracle=_dedup_ivf_oracle())
def dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF embedding dedup end-to-end: build the learned IVF index ->
    multi-probe candidate pairs (each vector probes its 2 nearest
    cells) -> exact cosine rerank >= 0.45. Every stage is a key
    equi-join: at 10^10 vectors the candidate count is bounded by cell
    size x n_probes, the cell column becomes the table partition, and
    recall is tuned with n_probes instead of re-blocking. The index is
    the same oracle-checked deterministic Lloyd quantizer as
    ann_ivf_topk; dedup_embedding_cosine remains the all-pairs recall
    yardstick."""
    from etl_spark.operators.similarity import ivf_dedup_pairs
    from etl_spark.queries.similarity import IVF_ITERS, IVF_K, N_PROBES

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_dedup_pairs(
        e,
        "vec_id",
        "embedding",
        threshold=COSINE_THRESHOLD,
        k=IVF_K,
        iters=IVF_ITERS,
        n_probes=N_PROBES,
        # oracle trains full Lloyd — see ann_ivf_topk's note
        max_training_rows=None,
    )
