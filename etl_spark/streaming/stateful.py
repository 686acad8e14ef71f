"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-keyed-state member of the UDF surface (SURVEY.md §2.11;
the other members live in functions/extract.py [scalar pandas_udf],
operators/merge_spj.py [grouped-map], operators/multimodal.py /
segment.py [mapInPandas 1->N]).

``stateful_lww_updates`` maintains the engine's last-writer-wins
arbitration as PER-KEY STREAMING STATE: group the change stream by url,
keep the current winner (warc_ts, seq, op, carried values) in
GroupState across micro-batches, and emit a row ONLY when a batch
changes a key's winner. It is the CDC merge loop re-expressed as a
streaming materialized view — same arbitration total order as
operators/dedup.lww_dedup (``(warc_ts, seq)`` descending; the successor
of the reference's per-group most-recent voting,
/root/reference/etl/trajectory/builder.py:378-390), so draining any
micro-batch split of a change log converges to the same final winners
as the batch fold (the engine's replay-convergence property, proven in
tests/test_streaming.py::test_stateful_lww_stream_converges_to_batch_fold).

Scale design: state is one row per live key, hash-partitioned by the
group key into Spark's state store (RocksDB/HDFS-backed on a cluster) —
the same key-partitioning the lake's buckets use, no shuffle beyond the
groupBy. Each micro-batch touches only the keys present in the batch;
emission is delta-only (changed winners), so downstream consumers see
an update stream proportional to actual churn, not to state size.
Arrow-batched pandas on both sides — no per-row Python.

Contract: input must be CLEANED changes (operators/clean.clean_changes):
non-null url/warc_ts/op, (url, seq) unique. warc_ts rides through state
as exact int64 microseconds (never a float round-trip — the same exact-
integer discipline operators/merge_spj.py applies across the Arrow
boundary).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: the current winner per key. ts as int64 epoch-µs (exact), op
# collapsed to a deleted flag, plus the carried value columns appended
# dynamically (all nullable strings by contract below).
_STATE_FIXED = [
    T.StructField("ts_us", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
]


def _out_schema(value_cols: list[str]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("seq", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
        + [T.StructField(c, T.StringType()) for c in value_cols]
    )


def stateful_lww_updates(
    changes: DataFrame,
    value_cols: list[str] = ("lang",),
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming LWW materialized view: one update row per (micro-batch,
    key-whose-winner-changed). Final winners after draining the stream
    equal the batch ``lww_dedup(changes, ["url"], ["warc_ts", "seq"])``
    fold — the micro-batch split is invisible in the end state.

    ``value_cols`` are carried (string) payload columns riding on the
    winner (e.g. lang); the delete flag reflects the winning op, so a
    key whose winner is a delete is emitted with ``deleted=true`` (the
    tombstone-visible form — consumers drop those to get current pages).

    ``state_ttl`` (e.g. ``"2 hours"``) bounds state by the stream's
    late-event horizon — the streaming twin of the lake's
    ``expire_tombstones`` contract: a key idle past the horizon has its
    state dropped (event-time timeout against the REQUIRED watermark on
    ``warc_ts``), so retained state tracks churn x horizon instead of
    live-key count. Same assumption as tombstone GC, stated the same
    way: events later than the horizon never arrive; if one does, it
    re-arbitrates against an empty state and can win where the dropped
    winner would have beaten it. Without a TTL, state is one row per
    live key forever (exact, unbounded)."""
    value_cols = list(value_cols)
    state_schema = T.StructType(
        _STATE_FIXED + [T.StructField(c, T.StringType()) for c in value_cols]
    )
    out_schema = _out_schema(value_cols)
    ttl_ms = None
    if state_ttl is not None:
        import re as _re

        m = _re.fullmatch(
            r"\s*(\d+)\s*(millisecond|second|minute|hour|day)s?\s*",
            state_ttl,
        )
        if not m:
            raise ValueError(f"unparseable state_ttl: {state_ttl!r}")
        unit_ms = {
            "millisecond": 1,
            "second": 1000,
            "minute": 60_000,
            "hour": 3_600_000,
            "day": 86_400_000,
        }[m.group(2)]
        ttl_ms = int(m.group(1)) * unit_ms

    def update_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # horizon passed with no new events: drop the winner (the
            # GC of this operator). Nothing is emitted — downstream
            # materializations already hold the last update.
            state.remove()
            return
        if state.exists:
            best: tuple[Any, ...] | None = tuple(state.get)
        else:
            best = None
        prev = best
        max_ts_us = 0
        for pdf in pdfs:
            # exact integer µs: pandas datetime64[us/ns] -> int64
            ts_us = (pdf["warc_ts"].astype("datetime64[us]").astype("int64")).to_numpy()
            seqs = pdf["seq"].to_numpy()
            ops = pdf["op"].to_numpy()
            vals = [pdf[c].to_numpy() for c in value_cols]
            if len(ts_us) and int(ts_us.max()) > max_ts_us:
                max_ts_us = int(ts_us.max())
            for i in range(len(pdf)):
                cand = (
                    int(ts_us[i]),
                    int(seqs[i]),
                    ops[i] == "D",
                    *[None if pd.isna(v[i]) else str(v[i]) for v in vals],
                )
                # LWW total order: (warc_ts, seq) — identical to the
                # batch fold's max(struct(warc_ts, seq, ...)). seq is
                # globally unique after clean, so no further tiebreak
                # can be reached.
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        if best is not None and best != prev:
            state.update(best)
        if ttl_ms is not None and best is not None and max_ts_us:
            # horizon anchored to this key's newest EVENT time; fires
            # once the watermark passes it (event-time timeout)
            state.setTimeoutTimestamp(max_ts_us // 1000 + ttl_ms)
        if best is not None and best != prev:
            yield pd.DataFrame(
                {
                    "url": [key[0]],
                    "warc_ts": pd.Series(
                        [best[0]], dtype="int64"
                    ).astype("datetime64[us]"),
                    "seq": [best[1]],
                    "deleted": [best[2]],
                    **{c: [best[3 + j]] for j, c in enumerate(value_cols)},
                }
            )

    if state_ttl is not None:
        # event-time timeout needs the event-time column watermarked;
        # the watermark doubles as the late-event horizon the TTL
        # contract is stated against
        changes = changes.withWatermark("warc_ts", state_ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return changes.groupBy("url").applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
