"""ANSI-mode and null-sentinel edges of the scalar function library
(Spark 4 runs ANSI by default: out-of-bounds array indexing and
unparseable to_timestamp ABORT the job instead of returning null, so
every scalar must be total over its own documented null sentinels)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_argmin_key_empty_map_is_null(spark):
    from etl_spark.functions.keys import argmin_key

    df = spark.sql(
        "SELECT map('a', 2, 'b', 1) AS m "
        "UNION ALL SELECT map() "
        "UNION ALL SELECT CAST(NULL AS map<string,int>)"
    )
    got = [r.k for r in df.select(argmin_key(F.col("m")).alias("k")).collect()]
    assert sorted(got, key=lambda x: (x is None, x)) == ["b", None, None]


def test_timestamp_from_ids_null_sentinel_roundtrip(spark):
    """smart keys map null -> -1; the inverse must map -1 -> null (and
    not ANSI-abort on the unparseable '-1' string)."""
    from etl_spark.functions.keys import (
        smart_date_id,
        smart_time_id,
        timestamp_from_ids,
    )

    df = spark.sql(
        "SELECT TIMESTAMP '2024-03-05 06:07:08' AS ts "
        "UNION ALL SELECT CAST(NULL AS timestamp)"
    )
    out = df.select(
        F.col("ts"),
        timestamp_from_ids(
            smart_date_id(F.col("ts")), smart_time_id(F.col("ts"))
        ).alias("back"),
    ).collect()
    for r in out:
        assert r.back == r.ts  # identity on values, null -> null


def test_quality_score_null_text_is_null(spark):
    """A missing document must not outscore a bad one: null text ->
    null quality (unguarded, null-skipping least() handed it 0.25)."""
    from etl_spark.functions.text import quality_score

    df = spark.sql(
        "SELECT CAST(NULL AS string) AS t "
        "UNION ALL SELECT 'zzz qqq 12345'"  # real-but-awful text
    )
    rows = df.select(F.col("t"), quality_score(F.col("t")).alias("q")).collect()
    by_null = {r.t is None: r.q for r in rows}
    assert by_null[True] is None
    assert by_null[False] is not None and by_null[False] >= 0.0


def test_multimodal_kernels_total_over_nulls(spark):
    """Null text (a real corpus case) must not kill the task: meta
    emits a null-meta row (matching SQL null propagation in the
    oracle), frames emits nothing, and a null doc_id passes through
    segmentation as SQL null."""
    from etl_spark.operators.multimodal import (
        extract_meta,
        sample_frames,
        with_binary_payload,
    )
    from etl_spark.operators.segment import segment_documents

    df = spark.createDataFrame(
        [(1, "some real text"), (2, None), (None, "orphan text")],
        "doc_id bigint, text string",
    )
    mm = with_binary_payload(df)

    meta = {r.doc_id: r for r in extract_meta(mm).collect()}
    assert meta[1].payload_md5 is not None and meta[1].n_bytes == 14
    assert meta[2].payload_md5 is None and meta[2].n_bytes is None
    assert meta[2].width is None and meta[2].height is None

    frames = sample_frames(mm).collect()
    assert {r.doc_id for r in frames} == {1, None}  # null text: no frames

    chunks = segment_documents(df).collect()
    by_id = {r.doc_id for r in chunks}
    assert by_id == {1, None}  # null text skipped; null id passes through


def test_frame_md5_is_hex_fingerprint_multibyte_safe(spark):
    """The frame fingerprint is md5 of the chunk's lowercase hex —
    byte-true and oracle-reproducible even for multi-byte UTF-8."""
    import hashlib

    from etl_spark.operators.multimodal import (
        FRAME_BYTES,
        sample_frames,
        with_binary_payload,
    )

    text = ("é" * 40) + "plain tail"  # 2-byte chars straddle a boundary
    df = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    rows = sorted(
        sample_frames(with_binary_payload(df)).collect(),
        key=lambda r: r.frame_no,
    )
    payload = text.encode()
    assert len(rows) == max(1, -(-len(payload) // FRAME_BYTES))
    for r in rows:
        chunk = payload[r.frame_no * FRAME_BYTES : (r.frame_no + 1) * FRAME_BYTES]
        assert r.frame_len == len(chunk)
        assert r.frame_md5 == hashlib.md5(chunk.hex().encode()).hexdigest()
