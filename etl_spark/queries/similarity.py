"""Similarity-search queries over the embeddings table: exact
brute-force top-k (baseline), label-partitioned top-k (IVF-shaped scale
path), and random-hyperplane LSH bucketed top-k. Operators in
etl_spark/operators/similarity.py.

The oracles compute cosine with the same double arithmetic; the LSH
hyperplanes are ±1 literals generated once (md5 parity) and embedded in
BOTH the Spark plan and the oracle SQL, so even the approximate
bucketing compares exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators import similarity as S
from etl_spark.queries import query
from etl_spark.sources.readers import load_table

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 10
LSH_PLANES = S.hyperplanes(n_planes=6, dim=64)  # 64 buckets over 500 vecs

_COS = """
             list_sum(list_transform(range(1, 65), i -> q.e[i] * c.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> c.e[i] * c.e[i]))))
"""

_V_CTE = """
    v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    )
"""


# ---------------------------------------------------------------------------
@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH {_V_CTE},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_COS} AS cos_raw
      FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, rank, cand_id, ROUND(cos_raw, 4) AS cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector: broadcast queries x scan
    corpus, one window per query for the top-k — the correctness
    baseline for every approximate variant."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(queries, e, "vec_id", "embedding", k=TOP_K)


# ---------------------------------------------------------------------------
@query(
    "ann_partitioned_topk",
    oracle=f"""
    WITH {_V_CTE},
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS cell, c.vec_id AS cand_id,
             {_COS} AS cos_raw
      FROM v q JOIN v c ON q.label = c.label
       AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cell, cand_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, cell, rank, cand_id, ROUND(cos_raw, 4) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def ann_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-shaped search: the label column plays the coarse-quantizer
    cell; only the query's cell is probed (equi-join instead of cross
    join — candidate count / partition fan-out). At corpus scale the
    cells are Iceberg bucket partitions and the probe is file-pruned."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return S.partitioned_topk(queries, e, "vec_id", "embedding", "label", k=5)


# ---------------------------------------------------------------------------
def _plane_sql(row: list[int]) -> str:
    return "[" + ", ".join(f"{x}.0" for x in row) + "]"


_SIG_SQL = " || ".join(
    f"""(CASE WHEN list_sum(list_transform(range(1, 65),
         i -> {_plane_sql(row)}[i] * e[i])) > 0 THEN '1' ELSE '0' END)"""
    for row in LSH_PLANES
)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH {_V_CTE},
    sigs AS (
      SELECT vec_id, e, {_SIG_SQL} AS sig FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum(list_transform(range(1, 65), i -> q.e[i] * c.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> c.e[i] * c.e[i]))))
             AS cos_raw
      FROM sigs q JOIN sigs c ON q.sig = c.sig
       AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, rank, cand_id, ROUND(cos_raw, 4) AS cosine
    FROM ranked WHERE rank <= 3
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 6-bit sign signature -> bucket equi-join
    -> exact rerank within the bucket. Recall is the LSH trade; the
    oracle embeds the identical hyperplane literals so the candidate
    sets (and therefore results) match exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_bucket_topk(
        queries, e, "vec_id", "embedding", k=3, planes=LSH_PLANES
    )
