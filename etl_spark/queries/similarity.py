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
# IVF with LEARNED centroids: deterministic Lloyd k-means (k=8, 2
# iterations, lowest-id init, id-ordered mean folds) builds the coarse
# quantizer; search probes only the query's cell. The oracle re-derives
# the identical centroids in SQL CTE algebra — every float op (squared
# L2 fold, ordered mean, cosine) uses the same operation order, so the
# learned index itself is oracle-checked, not just the final ranking.
# ---------------------------------------------------------------------------
IVF_K = 8
IVF_ITERS = 2

_SQDIST = """
             list_sum(list_transform(range(1, 65),
               i -> (p.e[i] - c.ce[i]) * (p.e[i] - c.ce[i])))
"""


def _assign_cte(points: str, cents: str, out: str) -> str:
    """argmin-of-squared-L2 assignment with lowest-cell tiebreak."""
    return f"""
    {out}_scored AS (
      SELECT p.vec_id, p.e, c.cell, {_SQDIST} AS dist
      FROM {points} p CROSS JOIN {cents} c
    ),
    {out} AS (
      SELECT vec_id, e, cell FROM (
        SELECT vec_id, e, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM {out}_scored
      ) WHERE rn = 1
    )"""


def _update_cte(assigned: str, out: str) -> str:
    """Per-dim mean with the summation order pinned to ascending vec_id
    (double addition is not associative; an unordered SUM would diverge
    from the engine bit-wise)."""
    return f"""
    {out} AS (
      SELECT cell,
             list_transform(range(1, 65),
               i -> list_sum(list_transform(vl, x -> x[i])) / len(vl)) AS ce
      FROM (
        SELECT cell, array_agg(e ORDER BY vec_id) AS vl
        FROM {assigned} GROUP BY cell
      )
    )"""


@query(
    "ann_ivf_topk",
    oracle=f"""
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
    scored AS (
      SELECT q.vec_id AS query_id, q.cell, c.vec_id AS cand_id,
             {_COS} AS cos_raw
      FROM a2 q JOIN a2 c ON q.cell = c.cell
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
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with a LEARNED coarse quantizer (deterministic Lloyd,
    operators/similarity.kmeans_cells); only the query's cell is probed
    (equi-join instead of cross join — candidate count / cell fan-out).
    At corpus scale: learn on a deterministic sample, one assignment
    pass writes the cell column, cells become Iceberg partitions, and
    probes are file-pruned joins (probe-adjacent-cells is the recall
    knob, same plan shape with IN (cells))."""
    e = load_table(spark, sf_dir, "embeddings")
    # max_training_rows=None: this query's oracle re-derives the FULL
    # Lloyd loop in SQL, so the engine must train on every row too —
    # the id-hash sample guard (the production default, which the
    # oracle's CTE algebra cannot replicate: no xxhash64 in DuckDB)
    # would silently diverge past 100k vectors. The registered test
    # tables are bounded; corpus-scale callers use the guarded default.
    cells, _, _ = S.kmeans_cells(
        e, "vec_id", "embedding", k=IVF_K, iters=IVF_ITERS,
        max_training_rows=None,
    )
    with_cells = e.join(cells, e.vec_id == cells.vid).drop("vid")
    queries = with_cells.filter(F.col("vec_id") < N_QUERIES)
    return S.partitioned_topk(
        queries, with_cells, "vec_id", "embedding", "cell", k=5
    )


# ---------------------------------------------------------------------------
# The GUARDED k-means path (train-on-sample), driver-proven: with
# max_training_rows=64 over the 500-vector table, kmeans_cells takes
# the production branch — overflow probe, exact count, sample_mod =
# ceil(500/64) = 8, Lloyd on the deterministic id-hash sample
# pmod(xxhash64(vid), 8) == 0, full-corpus final assignment. DuckDB has
# no xxhash64, so the SAMPLE MEMBERSHIP is pinned as literals. The pin
# is valid because membership depends ONLY on vec_id (not embedding
# values), and both gate scales (sf0.001 local parity, sf0.01 driver)
# carry exactly vec_id 0..499 — verified 2026-08-18; sf0.1 has 2000 ids
# and would need a re-pin, but only the Spark side runs there (bench).
# Everything downstream — init, both Lloyd iterations, assignment,
# search — is re-derived in SQL, not pinned.
# ---------------------------------------------------------------------------
SAMPLED_MAX_TRAIN = 64
# pmod(xxhash64(vec_id), 8) == 0 over vec_id 0..499 (seed 42, BIGINT)
_SAMPLED_IDS = (
    12, 13, 30, 35, 67, 91, 100, 104, 106, 114, 119, 120, 138, 141, 142,
    158, 165, 197, 202, 217, 219, 226, 242, 246, 251, 259, 264, 266, 270,
    274, 275, 284, 296, 301, 304, 306, 311, 339, 343, 349, 370, 372, 375,
    376, 380, 385, 392, 397, 401, 403, 406, 411, 416, 426, 428, 436, 445,
    447, 448, 453, 461, 463, 482, 486,
)


@query(
    "ann_ivf_sampled_topk",
    oracle=f"""
    WITH {_V_CTE},
    train AS (
      SELECT * FROM v WHERE vec_id IN {_SAMPLED_IDS}
    ),
    c0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS cell, e AS ce
      FROM (SELECT vec_id, e FROM train ORDER BY vec_id LIMIT {IVF_K})
    ),
    {_assign_cte("train", "c0", "a0")},
    {_update_cte("a0", "c1")},
    {_assign_cte("train", "c1", "a1")},
    {_update_cte("a1", "c2")},
    {_assign_cte("v", "c2", "a2")},
    scored AS (
      SELECT q.vec_id AS query_id, q.cell, c.vec_id AS cand_id,
             {_COS} AS cos_raw
      FROM a2 q JOIN a2 c ON q.cell = c.cell
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
def ann_ivf_sampled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search whose coarse quantizer is trained on the ENFORCED
    deterministic sample (the production default for unbounded corpora:
    Lloyd state stays bounded no matter how big the input); only the
    final stateless assignment pass sees every row. Identical search
    plan to ann_ivf_topk — what this row proves is the guarded training
    path itself."""
    e = load_table(spark, sf_dir, "embeddings")
    cells, _, _ = S.kmeans_cells(
        e, "vec_id", "embedding", k=IVF_K, iters=IVF_ITERS,
        max_training_rows=SAMPLED_MAX_TRAIN,
    )
    with_cells = e.join(cells, e.vec_id == cells.vid).drop("vid")
    queries = with_cells.filter(F.col("vec_id") < N_QUERIES)
    return S.partitioned_topk(
        queries, with_cells, "vec_id", "embedding", "cell", k=5
    )


# ---------------------------------------------------------------------------
# Multi-probe IVF: same learned quantizer, but each query probes its
# n_probes nearest cells (rank by squared-L2 to the final centroids,
# ties to the lowest cell id) — the recall knob a real IVF user tunes.
# The oracle re-derives the probe ranking from the same c2 centroids.
# ---------------------------------------------------------------------------
N_PROBES = 2


@query(
    "ann_multiprobe_topk",
    oracle=f"""
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
      SELECT p.vec_id, p.e, c.cell, {_SQDIST} AS dist
      FROM (SELECT * FROM a2 WHERE vec_id < {N_QUERIES}) p CROSS JOIN c2 c
    ),
    probes AS (
      SELECT vec_id, e, cell FROM (
        SELECT vec_id, e, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS prn
        FROM probe_d
      ) WHERE prn <= {N_PROBES}
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_COS} AS cos_raw
      FROM probes q JOIN a2 c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, rank, cand_id, ROUND(cos_raw, 4) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF top-k: the learned-quantizer search probing the
    2 nearest cells per query (recall knob over ann_ivf_topk, which is
    the n_probes=1 plan). The query side explodes to n_probes rows —
    still tiny, still broadcast — while the corpus side stays a
    cell-partitioned equi-join, so candidate count grows linearly in
    n_probes. Cell ids are threaded from kmeans_cells (a cell that
    empties during Lloyd leaves non-contiguous survivors; positional
    ids would probe the wrong cells)."""
    e = load_table(spark, sf_dir, "embeddings")
    # max_training_rows=None: oracle trains full Lloyd (see ann_ivf_topk)
    cells, centroids, cell_ids = S.kmeans_cells(
        e, "vec_id", "embedding", k=IVF_K, iters=IVF_ITERS,
        max_training_rows=None,
    )
    with_cells = e.join(cells, e.vec_id == cells.vid).drop("vid")
    queries = with_cells.filter(F.col("vec_id") < N_QUERIES)
    return S.multiprobe_topk(
        queries,
        with_cells,
        "vec_id",
        "embedding",
        "cell",
        centroids,
        n_probes=N_PROBES,
        k=5,
        cell_ids=cell_ids,
    )


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
             {_COS} AS cos_raw
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
