"""Centralized schema constants — successor of the reference's
column-name constants module (/root/reference/etl/constants.py:13-74)
and its hand-pinned dtype tables (clean_data.py:86-114,
builder.py:542-591). No schema inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The lake table of Common-Crawl-style pages (BASELINE.json input_hint).
# ---------------------------------------------------------------------------

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        # the winning event's change-log seq: persisted so CROSS-epoch
        # arbitration can compare the full lexicographic (warc_ts, seq)
        # order tuple, not warc_ts alone — an equal-timestamp event in a
        # later epoch must still lose to a higher-seq stored row (the
        # global-LWW oracle's ORDER BY warc_ts DESC, seq DESC). Null on
        # rows written before this column existed (treated as -inf).
        T.StructField("seq", T.LongType(), True),
        # Tombstone flag: a winning delete persists as a row carrying
        # (url, warc_ts, seq, _deleted=true) and null payload. Without
        # it, a LATE event (older warc_ts) for a deleted key arriving in
        # a later epoch has no stored state to arbitrate against and
        # resurrects the row — replay would then diverge from the
        # global-LWW fold. Reads filter tombstones by default
        # (LakeTable.read); expire_tombstones GC-drops them once the
        # stream's late-event horizon has passed, so retained state is
        # bounded by delete-rate x horizon, never by history.
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

# Schema-evolution scenario: `lang` appears mid-stream (FIXTURES.md §2).
PAGES_SCHEMA_V0 = T.StructType([f for f in PAGES_SCHEMA.fields if f.name != "lang"])

# ---------------------------------------------------------------------------
# The WAL/binlog-shaped change stream (FIXTURES.md §2).
# ---------------------------------------------------------------------------

CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),  # null for 'D'
        T.StructField("lang", T.StringType(), True),  # absent before E_evolve
    ]
)

CHANGES_SCHEMA_V0 = T.StructType([f for f in CHANGES_SCHEMA.fields if f.name != "lang"])

# ---------------------------------------------------------------------------
# Lineage — successor of the reference audit log
# (/root/reference/etl/init/sql/40_audit_log.sql:1-12,
#  /root/reference/etl/audit/logger.py:81-103): one row per
# (epoch, stage); throughput metrics land here so every run is
# self-documenting.
# ---------------------------------------------------------------------------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("seconds", T.DoubleType(), True),
        T.StructField("engine_version", T.StringType(), True),
        # "ok", or "ExceptionType: message" when the stage body raised —
        # a failed epoch attempt leaves an audit trail instead of
        # vanishing (the rows are flushed from ingest_epoch's finally)
        T.StructField("status", T.StringType(), True),
        # set only on the per-epoch stage="metrics" row (north rule:
        # "throughput/lag metrics emitted each epoch"): applied events
        # per wall-second across the epoch's stages, and the end-to-end
        # event-time lag (commit wall-clock minus newest event time)
        T.StructField("events_per_sec", T.DoubleType(), True),
        T.StructField("event_lag_seconds", T.DoubleType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided TPC-H-ish test tables (TESTDATA.md) — pinned here the
# way the reference pins its 24 CSV dtypes, so readers never infer.
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
