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
    # Byte-true for ANY UTF-8 content: frames are sliced on the
    # lowercase-hex encoding (2 chars == 1 byte, plain ASCII), so
    # char-based substr reproduces the kernel's byte slicing exactly;
    # the fingerprint on both sides is md5(hex-of-chunk). A raw
    # substr(text, ...) would slice CHARACTERS and silently diverge
    # from the kernel on the first multi-byte document.
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n_bytes,
             unnest(range(0, greatest(
               ceil(octet_length(encode(text)) / {M.FRAME_BYTES}.0)::BIGINT, 1
             ))) AS frame_no
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT doc_id, frame_no::INT AS frame_no,
           least({M.FRAME_BYTES}, n_bytes - frame_no * {M.FRAME_BYTES})::INT AS frame_len,
           md5(substr(hx, (frame_no * {2 * M.FRAME_BYTES} + 1)::INT,
                      {2 * M.FRAME_BYTES})) AS frame_md5
    FROM frames
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each payload fans out to fixed-size chunks
    (video-frame shape) inside mapInPandas — output rows > input rows,
    which the Arrow iterator contract handles natively. Null text
    contributes no frames (on both twins)."""
    d = load_table(spark, sf_dir, "documents")
    return M.sample_frames(M.with_binary_payload(d), "doc_id")
