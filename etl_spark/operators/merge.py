"""Key-partitioned MERGE upsert into a LakeTable.

The Spark-native successor of the reference's entire insert layer:
* "ensure" probe-then-insert (/root/reference/etl/insert/
  bulk_inserter.py:59-113)            -> WHEN NOT MATCHED INSERT branch
* ON CONFLICT DO NOTHING idempotency  -> applied-epoch bookkeeping
* UPDATE ... FROM post-insert fixups (/root/reference/etl/rollup/sql/
  simplify_trajectories.sql:1-6)      -> WHEN MATCHED UPDATE branch
* no reference analog                 -> WHEN MATCHED AND op='D' DELETE
  (CDC requires deletes; the reference only has whole-day rollback).

Semantics (per key, within one epoch's delta, LWW on (warc_ts, seq)):
  I/U upsert the row if it is newer-or-equal to the stored row;
  D deletes the key if newer-or-equal; older events lose silently.
``>=`` (not ``>``) makes a replay of the exact same event converge to
the same state instead of flip-flopping — idempotence at row grain, on
top of epoch-grain skip.

Scale design
------------
1. delta is LWW-deduped first (skew-aware) — one winner per key;
2. winner keys are hashed to buckets; only touched buckets are read
   back (file-list pruning in LakeTable.read — at 10^10 total rows an
   epoch touching 1% of keys reads ~1% of data, not 100 TB);
3. current-vs-delta is a full_outer equi-join on the key *within
   identically bucketed data* (both sides repartitioned by bucket
   before the join, so AQE sees uniform partitions; post-dedup there is
   exactly one row per key per side — no join-side skew possible);
4. new bucket files are written once, untouched buckets carry forward;
   one atomic snapshot commit per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake.table import (
    BUCKET_COL,
    DELETED_COL,
    LakeTable,
    Snapshot,
    bucket_expr,
)
from etl_spark.operators.dedup import adaptive_lww_dedup

OP_COL = "op"


@dataclass
class MergeStats:
    epoch: int
    skipped: bool
    touched_buckets: int
    delta_rows: int
    version: int


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema`` — missing columns become typed
    nulls (unionByName(allowMissingColumns) semantics; the additive
    schema-evolution read path)."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(cols)


def evolve_for_delta(table: LakeTable, delta: DataFrame) -> Snapshot:
    """Additive schema evolution: any new non-control column appearing
    in the delta is added to the table schema (metadata-only commit)
    before the merge — the `lang` mid-stream scenario."""
    snap = table.snapshot()
    existing = {f.name for f in snap.schema.fields}
    control = {OP_COL, "seq", "epoch", BUCKET_COL}
    added = [
        f
        for f in delta.schema.fields
        if f.name not in existing and f.name not in control
    ]
    if added:
        nullable = [T.StructField(f.name, f.dataType, True) for f in added]
        snap = table.add_columns(nullable)
    return snap


def merge_epoch(
    spark: SparkSession,
    table: LakeTable,
    delta: DataFrame,
    epoch: int,
    order_cols: list[str] = ("warc_ts", "seq"),
    hot_threshold: int = 100_000,
    pre_deduped: bool = False,
    touched_buckets: list[int] | None = None,
    delta_rows: int | None = None,
) -> MergeStats:
    """Apply one epoch's change events to the table, exactly once.

    ``pre_deduped``: the pipeline dedups *before* the extract kernel so
    losers are never decoded (at 10^10 events decoding losers is the
    dominant wasted cost) — then passes the winners here with this flag.

    ``touched_buckets``/``delta_rows``: supplied by the pipeline's light
    stats pass (delta_stats). When present, the delta is NEVER
    cached — the merge write is the single full-compute action. Caching
    an epoch's payload is wrong at 10^10-event scale (it evicts or
    spills anyway and the columnar-cache build costs more than a
    recompute); bounded driver-side stats + one streamed pass is the
    shape that survives.
    """
    order_cols = list(order_cols)
    if epoch in table.applied_epochs():
        head = table.snapshot()
        return MergeStats(epoch, True, 0, 0, head.version)

    snap = evolve_for_delta(table, delta)
    key_cols = snap.key_cols
    schema = snap.schema  # payload schema (post-evolution)

    # 1. one winner per key (skew-aware; op + order ride along).
    if pre_deduped:
        winners = delta
    else:
        winners = adaptive_lww_dedup(
            delta, key_cols, order_cols, hot_threshold=hot_threshold
        )
    winners = winners.withColumn(BUCKET_COL, bucket_expr(key_cols, snap.n_buckets))

    cached = False
    if touched_buckets is None or delta_rows is None:
        # Fallback (no stats pass): cache winners for the two discovery
        # actions + the join.
        winners = winners.persist()
        cached = True
        touched = [r[0] for r in winners.select(BUCKET_COL).distinct().collect()]
        delta_rows = winners.count()
    else:
        touched = [int(b) for b in touched_buckets]
    if not touched:
        if cached:
            winners.unpersist()
        head = table.commit(
            None,
            applied_epoch=epoch,
            summary={
                "operation": "merge",
                "epoch": epoch,
                "rows": 0,
                "touched_list": [],  # "nothing touched", not "unknown"
            },
        )
        return MergeStats(epoch, False, 0, 0, head.version)

    # 2. bucket-pruned current state — WITH tombstones: a stored delete
    # marker must out-arbitrate any late (older) event for its key.
    current = table.read(
        spark, buckets=touched, with_bucket=True, include_deleted=True
    )

    # 3. full-outer on key; versioned-winner arbitration.
    payload_cols = [f.name for f in schema.fields]
    cur = align_to_schema(current, schema)
    have = set(winners.columns)
    d_cols = [
        (
            F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)
        ).alias(f"_d_{f.name}")
        for f in schema.fields
    ]
    d_cols.append(F.col(OP_COL).alias("_d_op"))
    dlt = winners.select(d_cols)

    join_cond = [cur[k] == dlt[f"_d_{k}"] for k in key_cols]
    joined = cur.join(dlt, join_cond, "full_outer")

    delta_present = dlt[f"_d_{key_cols[0]}"].isNotNull()
    current_present = cur[key_cols[0]].isNotNull()
    # delta wins if no current row, or it is newer-or-equal on the FULL
    # lexicographic (order_cols) tuple — the table persists the winning
    # seq precisely so equal-timestamp arbitration across epochs matches
    # the global LWW order (warc_ts DESC, seq DESC), not arrival order.
    # A stored null seq (pre-upgrade rows) compares as -inf, preserving
    # the old ties-go-to-delta behavior for legacy rows only.
    ts = order_cols[0]
    payload_names = {f.name for f in schema.fields}
    tiebreak = order_cols[1] if len(order_cols) > 1 else None
    # Null-total ordering on the PRIMARY order column too (nulls = -inf,
    # type-agnostically via isNull tests instead of a typed sentinel):
    # `_d_ts > NULL` is NULL, which would make delta_wins NULL, fail
    # keep_delta AND keep_current, and silently DROP the key — the same
    # hazard the tiebreak below already guards. The pages schema
    # declares warc_ts non-nullable, but merge_epoch is a generic API
    # over any order column.
    d_ts, c_ts = F.col(f"_d_{ts}"), cur[ts]
    # explicit when-chain, not (d > c) | ...: a null operand makes the
    # comparison NULL and `NULL OR false` is still NULL — the exact
    # three-valued leak being closed
    ts_gt = (
        F.when(d_ts.isNull(), F.lit(False))
        .when(c_ts.isNull(), F.lit(True))
        .otherwise(d_ts > c_ts)
    )
    ts_eq = d_ts.eqNullSafe(c_ts)
    if tiebreak is not None and tiebreak in payload_names:
        # BOTH sides null-coalesce to -inf: a null seq anywhere must
        # degrade to the ties-go-to-delta rule, never make the whole
        # comparison NULL.
        cur_tb = F.coalesce(cur[tiebreak], F.lit(-(2**63)).cast("long"))
        d_tb = F.coalesce(
            F.col(f"_d_{tiebreak}"), F.lit(-(2**63)).cast("long")
        )
        newer = ts_gt | (ts_eq & (d_tb >= cur_tb))
    else:
        newer = ts_gt | ts_eq
    delta_wins = delta_present & (~current_present | newer)
    is_d = F.col("_d_op") == F.lit("D")
    tombstoning = DELETED_COL in payload_names
    if tombstoning:
        # winning deletes persist as tombstone rows (keys + order tuple,
        # payload nulls, _deleted=true) so late older events in future
        # epochs still lose arbitration — see schema.py PAGES_SCHEMA.
        keep_delta = delta_wins
    else:  # legacy tables without the column: drop on delete
        keep_delta = delta_wins & ~is_d
    keep_current = current_present & ~delta_wins

    preserve = set(key_cols) | set(order_cols)
    out_cols = []
    for f in schema.fields:
        c = f.name
        if c == DELETED_COL:
            e = F.when(delta_wins, is_d).otherwise(
                F.coalesce(cur[c], F.lit(False))
            )
        elif tombstoning and c not in preserve:
            e = (
                F.when(delta_wins & is_d, F.lit(None).cast(f.dataType))
                .when(delta_wins, F.col(f"_d_{c}"))
                .otherwise(cur[c])
            )
        else:
            e = F.when(keep_delta, F.col(f"_d_{c}")).otherwise(cur[c])
        out_cols.append(e.alias(c))
    merged = (
        joined.filter(keep_delta | keep_current)
        .select(*out_cols)
        .withColumn(BUCKET_COL, bucket_expr(key_cols, snap.n_buckets))
    )

    # 4. rewrite touched buckets + atomic commit recording the epoch.
    new_snap = table.commit(
        merged,
        touched_buckets=touched,
        applied_epoch=epoch,
        event_time_col=order_cols[0],
        summary={
            "operation": "merge",
            "epoch": epoch,
            "rows": delta_rows,
            "touched_buckets": len(touched),
            "touched_list": [int(b) for b in touched],
        },
    )
    if cached:
        winners.unpersist()
    return MergeStats(epoch, False, len(touched), delta_rows, new_snap.version)
