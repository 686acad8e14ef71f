"""Round-5 ADVICE regressions: overwrite_all lost-race semantics,
bucket-spec-stable rebase, orphan-claim GC, and lineage metrics
idempotence.

Races are made deterministic with the same publish-interception trick
as test_concurrency_and_gc: the competing commit lands inside the
victim's first publish attempt.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_spark.lake.table import CommitConflictError, LakeTable, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)


def _mk_table(tmp_path, n_buckets=4) -> LakeTable:
    return LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_cols=["k"], n_buckets=n_buckets
    )


def _bucketed(spark, table: LakeTable, rows, n_buckets=None):
    snap = table.snapshot()
    df = spark.createDataFrame(rows, SCHEMA)
    return df.withColumn(
        "_bucket", bucket_expr(snap.key_cols, n_buckets or snap.n_buckets)
    )


def _race_once(monkeypatch, competing):
    orig = LakeTable._publish
    state = {"armed": True}

    def pre_empted(self, snap):
        if state["armed"]:
            state["armed"] = False
            competing()
        return orig(self, snap)

    monkeypatch.setattr(LakeTable, "_publish", pre_empted)


# ---------------------------------------------------------------------------
# ADVICE medium #1: overwrite_all must never rebase over a concurrent
# commit (republished pre-race files would erase the winner's rows and
# adopting its applied_epochs would suppress replay of the lost epoch).
# ---------------------------------------------------------------------------


def test_overwrite_all_lost_race_raises_not_clobbers(spark, tmp_path, monkeypatch):
    t = _mk_table(tmp_path)
    t.append(spark.createDataFrame([("a", 1)], SCHEMA))

    def winner_append():
        t.append(spark.createDataFrame([("b", 2)], SCHEMA))

    _race_once(monkeypatch, winner_append)
    with pytest.raises(CommitConflictError, match="overwrite_all|re-derive"):
        t.commit(_bucketed(spark, t, [("a", 99)]), overwrite_all=True)
    # the winner's append survived; the loser published nothing
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [("a", 1), ("b", 2)]


def test_compact_files_rederives_after_lost_race(spark, tmp_path, monkeypatch):
    """compact_files is pure maintenance: on a lost race it re-reads the
    NEW head and compacts that — the concurrently appended row must be
    present in the compacted table."""
    t = _mk_table(tmp_path, n_buckets=2)
    for i in range(4):
        t.append(spark.createDataFrame([(f"k{i}", i)], SCHEMA))

    def winner_append():
        t.append(spark.createDataFrame([("late", 100)], SCHEMA))

    _race_once(monkeypatch, winner_append)
    snap = t.compact_files(spark, max_files=2)
    assert snap.summary["operation"] == "compact_files"
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert ("late", 100) in got and len(got) == 5
    # genuinely compacted: at most one file per bucket
    assert all(len(p) <= 1 for p in snap.files.values())


# ---------------------------------------------------------------------------
# ADVICE medium #2: a rebase onto a head whose bucket spec changed must
# fail loudly — the loser's files were hashed under the old layout.
# ---------------------------------------------------------------------------


def test_append_lost_race_to_rebucket_raises(spark, tmp_path, monkeypatch):
    t = _mk_table(tmp_path, n_buckets=4)
    t.append(spark.createDataFrame([("seed", 0)], SCHEMA))
    _race_once(monkeypatch, lambda: t.rebucket(spark, 16))
    with pytest.raises(CommitConflictError, match="bucket spec"):
        t.append(spark.createDataFrame([("a", 1)], SCHEMA))
    assert t.snapshot().n_buckets == 16
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [("seed", 0)]


def test_commit_lost_race_to_rebucket_raises_even_on_empty_bucket(
    spark, tmp_path, monkeypatch
):
    """The old clash check compared per-bucket file lists and missed the
    case where the touched bucket is empty on both sides; the spec guard
    must catch it regardless."""
    t = _mk_table(tmp_path, n_buckets=4)
    snap = t.snapshot()
    b = int(
        spark.createDataFrame([("x", 0)], SCHEMA)
        .select(bucket_expr(snap.key_cols, snap.n_buckets).alias("b"))
        .collect()[0][0]
    )
    _race_once(monkeypatch, lambda: t.rebucket(spark, 8))
    with pytest.raises(CommitConflictError, match="bucket spec"):
        t.commit(_bucketed(spark, t, [("x", 1)]), touched_buckets=[b])
    assert t.snapshot().n_buckets == 8


# ---------------------------------------------------------------------------
# ADVICE low #1: lost-race artifacts (abandoned claim + unreferenced
# data dir) are swept by expire_snapshots after the grace period.
# ---------------------------------------------------------------------------


def test_expire_snapshots_sweeps_orphan_claims_and_data(
    spark, tmp_path, monkeypatch
):
    t = _mk_table(tmp_path, n_buckets=2)
    snap = t.snapshot()
    b = int(
        spark.createDataFrame([("x", 0)], SCHEMA)
        .select(bucket_expr(snap.key_cols, snap.n_buckets).alias("b"))
        .collect()[0][0]
    )

    def winner_same_epoch():
        t.commit(
            _bucketed(spark, t, [("x", 7)]), touched_buckets=[b], applied_epoch=5
        )

    _race_once(monkeypatch, winner_same_epoch)
    # exactly-once loser: returns the winner's head, abandoning its
    # claim AND its already-written data/v<claim> directory
    t.commit(
        _bucketed(spark, t, [("x", 7)]), touched_buckets=[b], applied_epoch=5
    )
    snap_dir = os.path.join(t.root, "_snapshots")
    orphans = [
        f
        for f in os.listdir(snap_dir)
        if f.endswith(".claim")
        and not os.path.exists(os.path.join(snap_dir, f[: -len(".claim")]))
    ]
    assert orphans, "setup failed: the race should leave an abandoned claim"
    orphan_v = int(orphans[0][1:].split(".", 1)[0])
    orphan_data = t._data_dir(orphan_v)
    assert os.path.isdir(orphan_data)

    # grace period protects a potentially in-flight writer
    t.expire_snapshots(keep_last=2, orphan_grace_s=3600)
    assert os.path.exists(os.path.join(snap_dir, orphans[0]))

    t.expire_snapshots(keep_last=2, orphan_grace_s=0)
    assert not os.path.exists(os.path.join(snap_dir, orphans[0]))
    assert not os.path.isdir(orphan_data)
    # the winner's state is untouched
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [("x", 7)]


def test_expire_snapshots_keeps_rebased_losers_data(spark, tmp_path, monkeypatch):
    """A loser that successfully REBASED references its first claim's
    data dir from the rebased snapshot — the sweep must not touch it."""
    t = _mk_table(tmp_path)
    _race_once(
        monkeypatch,
        lambda: t.append(spark.createDataFrame([("b", 2)], SCHEMA)),
    )
    t.append(spark.createDataFrame([("a", 1)], SCHEMA))  # rebases
    t.expire_snapshots(keep_last=10, orphan_grace_s=0)
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [("a", 1), ("b", 2)]


# ---------------------------------------------------------------------------
# ADVICE low #2: LineageLog.metrics must not fold prior metrics rows
# into the seconds sum, and zero-duration throughput is a defined 0.0.
# ---------------------------------------------------------------------------


def test_metrics_second_call_does_not_double_count():
    from etl_spark.lineage import LineageLog

    log = LineageLog(None)
    with log.stage(3, "merge") as rec:
        rec["rows_in"] = 100
    log.rows[-1] = log.rows[-1][:5] + (2.0,) + log.rows[-1][6:]  # pin 2s
    log.metrics(3, n_events=100)
    first = [r for r in log.rows if r[2] == "metrics"][-1]
    assert first[5] == 2.0 and first[8] == pytest.approx(50.0)
    log.metrics(3, n_events=100)  # retried flush path
    second = [r for r in log.rows if r[2] == "metrics"][-1]
    assert second[5] == 2.0, "prior metrics row leaked into the sum"
    assert second[8] == pytest.approx(50.0)


def test_metrics_zero_duration_is_zero_not_none():
    from etl_spark.lineage import LineageLog

    log = LineageLog(None)
    log.metrics(1, n_events=500)  # no stage rows at all
    row = log.rows[-1]
    assert row[8] == 0.0 and row[8] is not None
