"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side machinery — schema, batch shape, partitioning, UDF
signatures — is real and tested; the actual media decode is STUBBED
(``decode_image`` raises NotImplementedError: PIL/ffmpeg are not in
this container) behind a deterministic fake parser so the pipeline is
end-to-end runnable and oracle-checkable. This mirrors how the engine
treats html (BinaryType payload + vectorized kernel,
functions/extract.py) — same slot, different media type.

Metadata derivation is md5-arithmetic over the payload bytes, portable
to the SQL oracle twin (queries/multimodal.py).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 64  # fixed "frame" size for the chunker

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def decode_image(payload: bytes):
    """REAL image decode — intentionally unimplemented in this
    container (no PIL/libjpeg). The fake parser below stands in; swap
    this in on a cluster image that ships codecs."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use parse_fake_header (deterministic stand-in)"
    )


def parse_fake_header(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a header parse: dimensions derived
    from the payload's md5 (portable to the SQL oracle)."""
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[:3], 16) % 1024
    height = 1 + int(h[3:6], 16) % 1024
    return width, height


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal table: utf-8 payload bytes (the stand-in
    for raw image/audio bytes) + a media-type tag."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("fake/image")
    )


def extract_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    kernel is vectorized per batch (hashlib per row is the stand-in for
    a real decoder call — still batch-amortized, never per-row Python
    *serialization*)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            md5s = payloads.map(lambda b: hashlib.md5(b).hexdigest())
            dims = payloads.map(parse_fake_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_md5": md5s,
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, META_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: split each payload into fixed-size chunks, one
    output row per chunk (the video-frame-sample shape: one input row
    fans out to many). mapInPandas handles the 1->N fan-out naturally —
    each yielded DataFrame may be longer than its input batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = max(1, math.ceil(len(payload) / FRAME_BYTES))
                for i in range(n_frames):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    frame_nos.append(i)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, FRAME_SCHEMA)
