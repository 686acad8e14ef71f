"""Structured Streaming ingest: the streaming driver must produce the
exact same final table state as the batch epoch loop, and recovery /
re-delivery must be a no-op (exactly-once through the applied-epoch
guard)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_spark.pipeline import Warehouse, ingest_range
from etl_spark.sources.changelog import changes_from_documents, epoch_provider
from etl_spark.streaming.ingest import stream_ingest, windowed_domain_counts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def change_files(spark, tmp_path_factory):
    """Change log laid out one parquet file per epoch (the WAL-segment
    layout a file-tailing stream consumes)."""
    root = str(tmp_path_factory.mktemp("changelog"))
    full = changes_from_documents(spark, SF_DIR, evolve_epoch=2)
    for epoch in range(3):
        (
            full.filter(F.col("epoch") == epoch)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"epoch={epoch}"))
        )
    # flat dir of files for the stream source (readStream needs a flat glob)
    flat = str(tmp_path_factory.mktemp("changelog_flat"))
    import glob
    import shutil

    for epoch in range(3):
        src = glob.glob(os.path.join(root, f"epoch={epoch}", "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(flat, f"epoch_{epoch}.parquet"))
    return flat


def _final_state(spark, wh):
    rows = (
        wh.pages.read(spark)
        .select("url", "warc_ts", "text", "lang")
        .collect()
    )
    return sorted((r.url, r.warc_ts, r.text, r.lang) for r in rows)


def test_stream_matches_batch(spark, change_files, tmp_path):
    # batch reference
    wh_b = Warehouse.init(str(tmp_path / "wh_batch"))
    ingest_range(
        spark, wh_b, epoch_provider(spark, SF_DIR, evolve_epoch=2), range(3)
    )
    batch_state = _final_state(spark, wh_b)

    # streaming run: AvailableNow drains the 3 files as micro-batches
    wh_s = Warehouse.init(str(tmp_path / "wh_stream"))
    q = stream_ingest(
        spark,
        wh_s,
        change_files,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        with_rollup=False,
    )
    q.awaitTermination(300)
    assert not q.isActive

    # micro-batch split differs from the epoch split (file order vs the
    # epoch column) but LWW convergence makes the final state identical
    assert _final_state(spark, wh_s) == batch_state
    # one applied epoch per micro-batch
    assert len(wh_s.pages.applied_epochs()) == 3


def test_stream_restart_is_noop(spark, change_files, tmp_path):
    wh = Warehouse.init(str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest(spark, wh, change_files, ckpt, with_rollup=False)
    q.awaitTermination(300)
    v1 = wh.pages.head_version()
    state1 = _final_state(spark, wh)

    # restart on the same checkpoint: no new files -> no batches; the
    # table must not move
    q2 = stream_ingest(spark, wh, change_files, ckpt, with_rollup=False)
    q2.awaitTermination(300)
    assert wh.pages.head_version() == v1
    assert _final_state(spark, wh) == state1


def test_windowed_domain_counts_batch_semantics(spark):
    """The watermarked aggregate, exercised on the batch frame (same
    expression tree the stream runs): counts per (domain, 1h window)."""
    changes = changes_from_documents(spark, SF_DIR, evolve_epoch=2)
    out = windowed_domain_counts(changes.drop("html"))
    rows = out.collect()
    assert rows
    total = sum(r.n_events for r in rows)
    assert total == changes.count()
    assert all(r.window_start < r.window_end for r in rows)


def test_stream_epochs_disjoint_from_batch_epochs(spark, change_files, tmp_path):
    """A warehouse loaded by the batch driver (epochs 0..2) and then
    streamed into must not skip micro-batches: streaming epoch ids live
    at STREAM_EPOCH_BASE + batch_id, so the applied-epoch guard can
    never mistake batch ids for stream ids (batch_id also starts at 0 —
    an unbased collision silently drops the stream's data while the
    checkpoint marks it consumed)."""
    from etl_spark.streaming.ingest import STREAM_EPOCH_BASE

    wh = Warehouse.init(str(tmp_path / "wh"))
    ingest_range(
        spark, wh, epoch_provider(spark, SF_DIR, evolve_epoch=2), range(3)
    )
    state_batch = _final_state(spark, wh)
    assert wh.pages.applied_epochs() == {0, 1, 2}

    # stream the same changelog into the SAME warehouse, fresh checkpoint
    q = stream_ingest(
        spark, wh, change_files, str(tmp_path / "ckpt"), with_rollup=False
    )
    q.awaitTermination(300)
    applied = wh.pages.applied_epochs()
    # every micro-batch was APPLIED (not skipped as "epoch 0/1/2 done")
    stream_epochs = {e for e in applied if e >= STREAM_EPOCH_BASE}
    assert len(stream_epochs) == 3
    assert applied == {0, 1, 2} | stream_epochs
    # and re-applying identical events is convergent (LWW ties keep state)
    assert _final_state(spark, wh) == state_batch


def test_stateful_lww_stream_converges_to_batch_fold(spark, change_files, tmp_path):
    """applyInPandasWithState LWW materialized view (SURVEY §2.11's
    arbitrary-keyed-state UDF member): draining the 3-file change log as
    3 micro-batches with per-url GroupState must converge to exactly the
    batch lww_dedup fold — same winners, same delete flags, same carried
    lang — and emissions must be delta-only (a key is re-emitted only
    when a batch actually changes its winner)."""
    from pyspark.sql import functions as F

    from etl_spark.operators.clean import clean_changes
    from etl_spark.operators.dedup import lww_dedup
    from etl_spark.streaming.ingest import stream_changes
    from etl_spark.streaming.stateful import stateful_lww_updates

    stream = stream_changes(spark, change_files, max_files_per_trigger=1)
    updates = stateful_lww_updates(clean_changes(stream), value_cols=["lang"])
    q = (
        updates.writeStream.format("memory")
        .queryName("lww_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    emitted = spark.table("lww_updates")
    # delta-only: the same winner is never emitted twice for a key
    assert (
        emitted.groupBy("url", "seq").count().filter(F.col("count") > 1).count()
        == 0
    )
    # final winner per key among emissions = the last (max (warc_ts, seq))
    final = lww_dedup(emitted, ["url"], ["warc_ts", "seq"])
    got = {
        r.url: (r.warc_ts, r.seq, r.deleted, r.lang) for r in final.collect()
    }

    # the batch fold over the same cleaned log
    batch = clean_changes(changes_from_documents(spark, SF_DIR, evolve_epoch=2))
    want_rows = lww_dedup(
        batch.select("url", "warc_ts", "seq", "op", "lang"),
        ["url"],
        ["warc_ts", "seq"],
    ).collect()
    want = {
        r.url: (r.warc_ts, r.seq, r.op == "D", r.lang) for r in want_rows
    }
    assert got == want
    # and fewer emissions than (keys x batches): unchanged keys stayed quiet
    assert emitted.count() < 3 * len(want)


def test_stateful_lww_state_ttl_drops_idle_keys(spark, tmp_path):
    """state_ttl bounds the stateful view's state by the late-event
    horizon (the streaming twin of expire_tombstones): a key idle past
    the watermark-driven TTL has its GroupState removed. Observable in
    the state-store metrics: 3 keys ever seen, one goes idle, final
    state rows == 2."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from etl_spark.operators.clean import clean_changes
    from etl_spark.streaming.ingest import stream_changes
    from etl_spark.streaming.stateful import stateful_lww_updates

    def batch(rows):
        return spark.createDataFrame(
            [
                (seq, 0, op, f"https://t.example/{key}", ts, b"<p>x</p>" if op != "D" else None, None)
                for seq, op, key, ts in rows
            ],
            "seq long, epoch long, op string, url string, warc_ts string, html binary, lang string",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    src = str(tmp_path / "wal")
    os.makedirs(src)
    files = [
        batch([(1, "I", "a", "2024-01-01 10:00:00"),
               (2, "I", "b", "2024-01-01 10:00:00")]),
        # advances the watermark to 19:00 (ttl 1h) -> a's horizon
        # (10:00 + 1h) is passed; its timeout fires next batch
        batch([(3, "U", "b", "2024-01-01 20:00:00")]),
        # fresh key above the watermark; a's state is removed this batch
        batch([(4, "I", "c", "2024-01-01 19:30:00")]),
    ]
    for i, df in enumerate(files):
        d = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        import glob as _glob
        import shutil as _shutil

        dst = os.path.join(src, f"epoch_{i}.parquet")
        _shutil.copy(_glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        # file source lists by modification time: pin the order
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = stream_changes(spark, src, max_files_per_trigger=1)
    q = (
        stateful_lww_updates(
            clean_changes(stream), value_cols=[], state_ttl="1 hour"
        )
        .writeStream.format("memory")
        .queryName("lww_ttl")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    emitted = spark.table("lww_ttl")
    # every winner change was emitted: a@10, b@10, b@20, c@19:30
    assert emitted.count() == 4
    # the state store ends with b + c only — a was dropped by the TTL
    progress = [p for p in q.recentProgress if p and p.get("stateOperators")]
    assert progress, "no state-operator progress recorded"
    final_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_rows == 2, f"expected 2 live state rows, got {final_rows}"


def test_stateful_lww_state_survives_restart(spark, tmp_path):
    """GroupState must recover from the streaming checkpoint: stop the
    query after draining two WAL files, deliver a third whose event for
    a known key LOSES the LWW arbitration against state written before
    the restart — a fresh (state-less) run would wrongly emit it."""
    import glob as _glob
    import os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from etl_spark.operators.clean import clean_changes
    from etl_spark.streaming.ingest import stream_changes
    from etl_spark.streaming.stateful import stateful_lww_updates

    def batch(rows):
        return spark.createDataFrame(
            [(seq, 0, op, f"https://t.example/{k}", ts, b"<p>x</p>", None)
             for seq, op, k, ts in rows],
            "seq long, epoch long, op string, url string, warc_ts string, html binary, lang string",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    src = str(tmp_path / "wal")
    os.makedirs(src)

    def add_file(i, df):
        d = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        dst = os.path.join(src, f"epoch_{i}.parquet")
        _shutil.copy(_glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i,) * 2)

    add_file(0, batch([(1, "I", "a", "2024-01-01 10:00:00")]))
    add_file(1, batch([(2, "U", "a", "2024-01-01 12:00:00")]))

    ckpt = str(tmp_path / "ckpt")

    def run():
        # foreachBatch, not the memory sink: memory-sink queries refuse
        # checkpoint recovery ("does not support recovering..."), and
        # recovery is the property under test
        emitted: list[tuple] = []
        stream = stream_changes(spark, src, max_files_per_trigger=1)

        def sink(batch_df, batch_id):
            emitted.extend((r.seq, r.warc_ts) for r in batch_df.collect())

        q = (
            stateful_lww_updates(clean_changes(stream), value_cols=[])
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
        return emitted

    first = run()
    assert {s for s, _ in first} == {1, 2}

    # a LATE event for `a`, older than the pre-restart winner (12:00):
    # with recovered state it loses arbitration and must NOT be emitted
    add_file(2, batch([(3, "U", "a", "2024-01-01 11:00:00")]))
    second = run()
    assert not second, (
        "late event won arbitration — GroupState was not recovered "
        f"from the checkpoint (emitted {second})"
    )


def test_session_window_converges_to_batch_gap_split(spark, change_files, tmp_path):
    """The streaming session_window twin of the batch gap-split
    sessionizer (windows.sessionized promises it): draining the change
    log as micro-batches must produce exactly the sessions the
    lag->flag->running-sum batch operator derives — same (domain,
    start, end, count), with session_end = last event + gap on both
    sides. Change-log timestamps are whole minutes, so the batch
    operator's floored-seconds gap equals the exact-timestamp gap
    session_window uses.

    Boundary semantics (this test MEASURED it): session_window merges
    an event arriving exactly ``gap`` after the previous one (split at
    Δt > gap); the engine's batch operator follows the reference and
    splits at Δt >= gap — so the batch twin here uses the > rule, and
    the operator docstrings document the gap-1s mapping."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_spark.operators.clean import clean_changes, domain_of
    from etl_spark.streaming.ingest import (
        sessionized_domain_counts,
        stream_changes,
    )

    # 9 min: the sparse domains emit every 10 min, so their gaps SPLIT
    # (600 > 540) while the dense domain's 1-min cadence merges — both
    # behaviors exercised
    gap_s = 540
    stream = stream_changes(spark, change_files, max_files_per_trigger=1)
    # watermark wider than the log's full event-time span: the change
    # log arrives in EPOCH order (later epochs carry earlier event
    # times), and the default 2 h watermark would drop those from the
    # aggregate — late-drop semantics are windowed_domain_counts'
    # contract; THIS test pins gap-split equivalence, so nothing may
    # be late.
    sess = sessionized_domain_counts(
        clean_changes(stream), gap=f"{gap_s} seconds", watermark="2 days"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("domain_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    got = {
        (r.domain, r.session_start, r.session_end, r.n_events)
        for r in spark.table("domain_sessions").collect()
    }

    # batch twin: the engine's lag -> gap-flag -> running-sum operator
    batch = clean_changes(
        changes_from_documents(spark, SF_DIR, evolve_epoch=2)
    ).select(domain_of(F.col("url")).alias("domain"), "warc_ts", "seq")
    w = Window.partitionBy("domain").orderBy("warc_ts", "seq")
    gap = F.unix_timestamp("warc_ts") - F.unix_timestamp(
        F.lag("warc_ts").over(w)
    )
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sessions = (
        batch.withColumn(
            "session_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("domain", "session_id")
        .agg(
            F.min("warc_ts").alias("session_start"),
            (F.max("warc_ts") + F.expr(f"INTERVAL {gap_s} SECONDS")).alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (r.domain, r.session_start, r.session_end, r.n_events)
        for r in sessions.collect()
    }
    assert got == want
    # multiple sessions per domain actually occurred (the split fired)
    assert len(want) > spark.table("domain_sessions").select("domain").distinct().count()
