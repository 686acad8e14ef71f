"""Multimodal-column queries: binary payloads + Arrow-batched
mapInPandas kernels (operators/multimodal.py). The "image decode" is a
deterministic fake-header parse (real codecs aren't in this container —
decode_image raises NotImplementedError by design); the Spark plumbing
(BinaryType columns, mapInPandas batch shape, 1->N frame fan-out,
typed output schemas) is real and oracle-checked via md5 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_spark.operators import multimodal as M
from etl_spark.queries import query
from etl_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id,
           strlen(text)::INT AS n_bytes,
           md5(text) AS payload_md5,
           (1 + ('0x' || substr(md5(text), 1, 3))::BIGINT % 1024)::INT AS width,
           (1 + ('0x' || substr(md5(text), 4, 3))::BIGINT % 1024)::INT AS height
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata extraction via mapInPandas: payload size, md5,
    and header-derived dimensions (fake parser standing in for the
    codec). One Arrow batch per task — no per-row serialization."""
    d = load_table(spark, sf_dir, "documents")
    return M.extract_meta(M.with_binary_payload(d), "doc_id")


# ---------------------------------------------------------------------------
@query(
    "mm_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, text, strlen(text) AS n_bytes,
             unnest(range(0, greatest(ceil(strlen(text) / {M.FRAME_BYTES}.0)::BIGINT, 1))) AS frame_no
      FROM documents
    )
    SELECT doc_id, frame_no::INT AS frame_no,
           least({M.FRAME_BYTES}, n_bytes - frame_no * {M.FRAME_BYTES})::INT AS frame_len,
           md5(substr(text, (frame_no * {M.FRAME_BYTES} + 1)::INT, {M.FRAME_BYTES})) AS frame_md5
    FROM frames
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each payload fans out to fixed-size chunks
    (video-frame shape) inside mapInPandas — output rows > input rows,
    which the Arrow iterator contract handles natively."""
    d = load_table(spark, sf_dir, "documents")
    return M.sample_frames(M.with_binary_payload(d), "doc_id")
