"""LakeTable: snapshot commits, bucket pruning, schema evolution,
rollback, expiry."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake.table import BUCKET_COL, LakeTable, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _with_bucket(df, snap):
    return df.withColumn(BUCKET_COL, bucket_expr(snap.key_cols, snap.n_buckets))


def test_create_read_empty(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 8)
    assert t.read(spark).count() == 0
    assert t.head_version() == 0
    assert t.snapshot().key_cols == ["k"]


def test_append_and_read(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 8)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.append(_df(spark, [("c", 3)]))
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    assert t.head_version() == 2


def test_bucket_pruning_reads_only_touched(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 8)
    rows = [(f"k{i}", i) for i in range(50)]
    t.append(_df(spark, rows))
    full = t.read(spark, with_bucket=True)
    some_bucket = full.select(BUCKET_COL).first()[0]
    pruned = t.read(spark, buckets=[some_bucket], with_bucket=True)
    assert pruned.count() > 0
    assert pruned.filter(F.col(BUCKET_COL) != some_bucket).count() == 0
    # pruned read touches strictly fewer files than the table holds
    snap = t.snapshot()
    assert len(snap.files[str(some_bucket)]) < sum(len(v) for v in snap.files.values())


def test_commit_exactly_once_per_epoch(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    snap0 = t.snapshot()
    data = _with_bucket(_df(spark, [("a", 1)]), snap0)
    t.commit(data, touched_buckets=[], applied_epoch=7, summary={})
    v1 = t.head_version()
    # replaying the same epoch is a no-op
    again = t.commit(data, touched_buckets=[], applied_epoch=7, summary={})
    assert t.head_version() == v1
    assert again.version == v1
    assert t.applied_epochs() == {7}


def test_schema_evolution_old_files_read_null(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    t.append(_df(spark, [("a", 1)]))
    t.add_columns([T.StructField("lang", T.StringType(), True)])
    df = t.read(spark)
    assert "lang" in df.columns
    row = df.filter(F.col("k") == "a").first()
    assert row.lang is None
    # new writes carry the column
    new_schema = t.snapshot().schema
    t.append(spark.createDataFrame([("b", 2, "en")], new_schema))
    got = {(r.k, r.lang) for r in t.read(spark).collect()}
    assert got == {("a", None), ("b", "en")}


def test_rollback(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    t.append(_df(spark, [("a", 1)]))
    v1 = t.head_version()
    t.append(_df(spark, [("b", 2)]))
    assert t.read(spark).count() == 2
    t.rollback(v1)
    assert t.read(spark).count() == 1


def test_expire_snapshots_keeps_head_readable(spark, tmp_wh):
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    for i in range(4):
        t.append(_df(spark, [(f"k{i}", i)]))
    removed = t.expire_snapshots(keep_last=2)
    assert removed
    assert t.read(spark).count() == 4


def test_compact_files_collapses_append_fragmentation(spark, tmp_wh):
    """Per-epoch appends fragment the table (one file set per append);
    compact_files rewrites to <= one file per bucket, preserves every
    row, stays a no-op below the threshold, and remains rollback-able."""
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    for i in range(12):
        t.append(_df(spark, [(f"k{i}", i)]))
    snap = t.snapshot()
    n_before = sum(len(p) for p in snap.files.values())
    assert n_before >= 12
    v_before = t.head_version()

    compacted = t.compact_files(spark, max_files=4, rebucket=True)
    n_after = sum(len(p) for p in compacted.files.values())
    assert n_after <= 4
    assert t.read(spark).count() == 12
    assert sorted(r.k for r in t.read(spark).collect()) == sorted(
        f"k{i}" for i in range(12)
    )
    # below threshold: no-op (same snapshot version back)
    again = t.compact_files(spark, max_files=64, rebucket=True)
    assert again.version == compacted.version
    # a maintenance commit is rollback-able like any other
    t.rollback(v_before)
    assert t.read(spark).count() == 12


def test_commit_after_rollback_never_reuses_versions(spark, tmp_wh):
    """A commit after rollback(v) starts a new branch but must allocate
    its version ABOVE every existing snapshot — head+1 would overwrite
    the rolled-back branch's manifest and data directory, breaking time
    travel to the abandoned versions."""
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    snap = t.snapshot()
    for i in range(3):  # v1..v3
        t.commit(
            _with_bucket(_df(spark, [(f"k{i}", i)]), snap),
            overwrite_all=True,
        )
    v3_rows = {(r.k, r.v) for r in t.read(spark, version=3).collect()}
    t.rollback(1)
    new = t.commit(
        _with_bucket(_df(spark, [("fix", 99)]), snap), overwrite_all=True
    )
    assert new.version == 4  # not 2
    assert new.parent == 1  # branch point recorded
    # the abandoned branch stays readable, byte for byte
    assert {(r.k, r.v) for r in t.read(spark, version=3).collect()} == v3_rows
    assert {(r.k, r.v) for r in t.read(spark, version=2).collect()} == {("k1", 1)}
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {("fix", 99)}
    # append after rollback takes the same allocation rule
    t.rollback(1)
    assert t.append(_df(spark, [("app", 7)])).version == 5


def test_expire_snapshots_keep_last_zero_keeps_only_head(spark, tmp_wh):
    """keep_last=0 is the most aggressive setting — only what HEAD
    needs survives (the -0 slice must not mean 'keep everything')."""
    t = LakeTable.create(os.path.join(tmp_wh, "t"), SCHEMA, ["k"], 4)
    for i in range(4):
        t.append(_df(spark, [(f"k{i}", i)]))
    removed = t.expire_snapshots(keep_last=0)
    assert set(removed) == {0, 1, 2, 3}
    assert t.versions() == [4]
    assert t.read(spark).count() == 4
