"""Tombstone semantics: replay/epoch-split convergence in the presence
of deletes and late (out-of-order) events.

The failure these pin: without retained delete markers, a winning 'D'
leaves NO stored state, so a late event (older (warc_ts, seq)) for the
same key arriving in a LATER epoch sees an empty slot and resurrects
the row — final state then depends on where the epoch boundaries fell,
violating the north rule's "replay from any checkpoint reproduces the
final table state". With tombstones, arbitration against the stored
marker makes final state a pure function of the event set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.pipeline import Warehouse, ingest_epoch

SCHEMA = (
    "seq long, epoch long, op string, url string, warc_ts string, "
    "html binary, lang string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )


def _visible(spark, wh):
    return sorted(
        (r.url, r.warc_ts, r.text)
        for r in wh.pages.read(spark).collect()
    )


# Event log with a delete that a LATE insert (older ts, lower seq) for
# the same key trails behind. Global LWW fold: the D (ts 03) beats the
# late I (ts 01) -> url /a stays deleted; /b is live.
EVENTS = [
    (1, "I", "https://x.example/a", "2024-01-02 00:00:00", b"<p>a v1</p>"),
    (2, "D", "https://x.example/a", "2024-01-03 00:00:00", None),
    (3, "I", "https://x.example/a", "2024-01-01 00:00:00", b"<p>a late</p>"),
    (4, "I", "https://x.example/b", "2024-01-01 00:00:00", b"<p>b v1</p>"),
]


def _run_split(spark, root, split, strategy):
    """Ingest EVENTS as epochs given by contiguous ``split`` boundaries."""
    wh = Warehouse.init(root, n_buckets=2)
    lo = 0
    for e, hi in enumerate(split + (len(EVENTS),)):
        chunk = [
            (seq, e, op, url, ts, html, None)
            for seq, op, url, ts, html in EVENTS[lo:hi]
        ]
        ingest_epoch(
            spark, wh, _df(spark, chunk), e, strategy=strategy, with_rollup=False
        )
        lo = hi
    return wh


@pytest.mark.parametrize("strategy", ["classic", "spj"])
def test_late_event_after_delete_does_not_resurrect(spark, tmp_path, strategy):
    """The minimal divergence case: [I, D] applied, then the late I
    arrives alone in the next epoch. The stored tombstone must win."""
    wh = Warehouse.init(str(tmp_path / f"wh_{strategy}"), n_buckets=2)
    url = "https://x.example/a"
    e0 = _df(spark, [
        (1, 0, "I", url, "2024-01-02 00:00:00", b"<p>v1</p>", None),
        (2, 0, "D", url, "2024-01-03 00:00:00", None, None),
    ])
    e1 = _df(spark, [
        (3, 1, "I", url, "2024-01-01 00:00:00", b"<p>late</p>", None),
    ])
    ingest_epoch(spark, wh, e0, 0, strategy=strategy, with_rollup=False)
    ingest_epoch(spark, wh, e1, 1, strategy=strategy, with_rollup=False)
    assert wh.pages.row_count(spark) == 0  # still deleted
    # the marker carries the delete's order tuple, not the late event's
    tomb = wh.pages.read(spark, include_deleted=True).collect()[0]
    assert tomb._deleted and tomb.seq == 2


@pytest.mark.parametrize("strategy", ["classic", "spj"])
def test_final_state_invariant_across_epoch_splits(spark, tmp_path, strategy):
    """Every contiguous split of the ordered change log into epochs
    (including the boundary falling exactly between D and the late I)
    converges to the same visible state."""
    splits = [(), (2,), (3,), (1, 3), (1, 2, 3)]
    states = []
    for i, split in enumerate(splits):
        wh = _run_split(
            spark, str(tmp_path / f"wh_{strategy}_{i}"), split, strategy
        )
        states.append(_visible(spark, wh))
    assert all(s == states[0] for s in states[1:])
    # and the converged state is the global LWW fold: only /b lives
    assert [u for u, _, _ in states[0]] == ["https://x.example/b"]


@pytest.mark.parametrize("strategy", ["classic", "spj"])
def test_newer_insert_resurrects_after_delete(spark, tmp_path, strategy):
    """A genuinely NEWER insert after a delete must win over the
    tombstone (resurrection by newer data is correct LWW)."""
    wh = Warehouse.init(str(tmp_path / f"wh_{strategy}"), n_buckets=2)
    url = "https://x.example/a"
    e0 = _df(spark, [(1, 0, "D", url, "2024-01-02 00:00:00", None, None)])
    e1 = _df(spark, [(2, 1, "I", url, "2024-01-03 00:00:00", b"<p>back</p>", None)])
    ingest_epoch(spark, wh, e0, 0, strategy=strategy, with_rollup=False)
    ingest_epoch(spark, wh, e1, 1, strategy=strategy, with_rollup=False)
    rows = wh.pages.read(spark).collect()
    assert len(rows) == 1 and rows[0].text == "back"
    # the tombstone was replaced, not duplicated
    assert wh.pages.read(spark, include_deleted=True).count() == 1
