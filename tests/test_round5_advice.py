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


# ---------------------------------------------------------------------------
# Round-5 review follow-ups: stats-mapping honesty and the rollup
# overwrite_all retry loops.
# ---------------------------------------------------------------------------


def test_unmapped_write_stats_leave_bucket_unknown(spark, tmp_path, monkeypatch):
    """If the input_file_name()->relpath mapping fails for a written
    file (e.g. a warehouse root reached through a symlink), the bucket
    must be left UNKNOWN in tombstone_stats — never recorded as
    [0, None] ("known clean"), which would permanently exclude it from
    tombstone-GC discovery."""
    import os

    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    t = LakeTable.create(str(tmp_path / "t"), schema, ["url"], n_buckets=1)

    # force every URI->relpath mapping to miss
    orig = LakeTable._scan_write_stats

    def broken_mapping(self, spark_, written, col, sch):
        import urllib.parse as up

        real = up.urlparse

        def twisted(u):
            r = real(u)
            return r._replace(path="/nonexistent" + r.path)

        monkeypatch.setattr(up, "urlparse", twisted)
        try:
            return orig(self, spark_, written, col, sch)
        finally:
            monkeypatch.setattr(up, "urlparse", real)

    monkeypatch.setattr(LakeTable, "_scan_write_stats", broken_mapping)
    df = spark.createDataFrame(
        [("https://x.example/a", "2020-01-01 00:00:00", True)],
        "url string, warc_ts string, _deleted boolean",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn(
        "_bucket", F.lit(0)
    )
    t.commit(df, touched_buckets=[0], event_time_col="warc_ts")
    stats = t.snapshot().tombstone_stats
    assert stats.get("buckets", {}).get("0") is None, (
        "bucket must be unknown, not fabricated-clean"
    )
    monkeypatch.setattr(LakeTable, "_scan_write_stats", orig)
    # unknown state -> GC scans the bucket and finds the marker
    out = t.expire_tombstones(spark, "2024-01-01 00:00:00", "warc_ts")
    assert out.summary.get("operation") == "expire_tombstones"
    assert t.read(spark, include_deleted=True).count() == 0


def test_rollup_full_refresh_retries_lost_race(spark, tmp_path, monkeypatch):
    """rollup_domain_stats' full-refresh overwrite_all commit re-derives
    and retries on a lost publish race instead of dying (same contract
    compact_files got)."""
    from pyspark.sql import functions as F

    from etl_spark.pipeline import Warehouse, ingest_epoch

    wh = Warehouse.init(str(tmp_path / "wh"), n_buckets=2)
    delta = spark.createDataFrame(
        [(1, 0, "I", "https://x.example/a", "2024-01-01 00:00:00",
          b"<p>a</p>", None)],
        "seq long, epoch long, op string, url string, warc_ts string, "
        "html binary, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    # the epoch's rollup runs the FULL-refresh path (fresh table) and
    # loses its first publish to a concurrent lineage-style append on
    # the rollup table
    from etl_spark.operators.rollup import ROLLUP_SCHEMA  # noqa: F401

    def competing():
        snap = wh.rollup.snapshot()
        empty = spark.createDataFrame([], snap.schema)
        wh.rollup.append(empty, summary={"operation": "noise"})

    orig = LakeTable._publish
    state = {"armed": True}

    def pre_empted(self, snap):
        if state["armed"] and self.root == wh.rollup.root and snap.summary.get(
            "operation"
        ) == "rollup":
            state["armed"] = False
            competing()
        return orig(self, snap)

    monkeypatch.setattr(LakeTable, "_publish", pre_empted)
    ingest_epoch(spark, wh, delta, 0)  # must not raise
    monkeypatch.setattr(LakeTable, "_publish", orig)
    from etl_spark.operators.rollup import read_rollup

    got = read_rollup(spark, wh.rollup).collect()
    assert len(got) == 1 and got[0].n_pages == 1
