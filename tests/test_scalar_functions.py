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
