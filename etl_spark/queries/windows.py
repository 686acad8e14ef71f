"""Window / ordered-per-key operator battery — SURVEY.md §2.5.

The reference implements every one of these as a hand-written per-group
Python loop inside its trajectory builder; here each is a pure window
expression (one shuffle on the key, whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.queries import query
from etl_spark.sources.readers import load_table

# Gap threshold for sessionization — the reference splits trajectories at
# 900 s point gaps (/root/reference/etl/trajectory/builder.py:37-38).
SESSION_GAP_S = 900


# ---------------------------------------------------------------------------
# W2 (pure-lag part): consecutive-row comparison per key — the reference's
# outlier speed check (/root/reference/etl/trajectory/builder.py:460-524):
# rate of change between consecutive points; same-timestamp ⇒ outlier.
# ---------------------------------------------------------------------------
@query(
    "lag_outlier_detect",
    oracle="""
    WITH lagged AS (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dt_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN dt_us = 0 THEN 1 END) AS n_same_ts,
           COUNT(CASE WHEN dt_us > 0
                       AND ABS(value - prev_value) / (dt_us / 1000000.0) > 1.0
                  THEN 1 END) AS n_outliers
    FROM lagged GROUP BY user_id
    """,
)
def lag_outlier_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over (partition by key order by ts): rate = |Δvalue|/Δt;
    Δt = 0 flags a same-timestamp row exactly like the reference.

    Δt in MICROseconds, not unix_timestamp's floored seconds: the event
    timestamps carry sub-second parts, so second truncation would call
    0.8s-apart events "same timestamp" and divide rates by a floored
    Δt (0.2s across a second boundary reads as a full second, shrinking
    the rate 5x). Exact-integer µs keeps the twins bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    lagged = ev.select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        dt.alias("dt_us"),
    )
    return lagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("dt_us") == 0, 1)).alias("n_same_ts"),
        F.count(
            F.when(
                (F.col("dt_us") > 0)
                & (
                    F.abs(F.col("value") - F.col("prev_value"))
                    / (F.col("dt_us") / F.lit(1000000.0))
                    > 1.0
                ),
                1,
            )
        ).alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# W2 (full sequential half): the reference's outlier loop chains against
# the previous NON-outlier row and rewrites SOG in place when the
# computed speed disagrees (/root/reference/etl/trajectory/
# builder.py:460-524) — a sequentially dependent state machine a pure
# lag() cannot express (dropping row i changes row i+1's comparison
# baseline). Re-expressed as a grouped-map applyInPandas kernel: one
# shuffle on the key, a tight per-group loop over numpy arrays (the
# reference's own shape, minus the per-ship process pool). The oracle
# is a DuckDB RECURSIVE walk advancing every key one row per step —
# O(total rows) work, rows-per-key iterations.
# ---------------------------------------------------------------------------
CHAIN_RATE_THRESHOLD = 0.02  # |Δvalue|/Δt above this ⇒ outlier (analog
# of the reference's speed threshold; sized so the sf events stream
# actually produces chains — p90 of observed rates is ~0.011)
REWRITE_DISAGREE = 0.5  # |computed − reported| above this ⇒ rewrite


def _chained_outlier_kernel(pdf):
    """Per-key sequential walk: prev = last NON-outlier row; same-ts or
    rate > threshold ⇒ outlier (dropped from the chain); kept rows emit
    a 'speed' that is the computed rate when it disagrees with the
    reported value by > REWRITE_DISAGREE (the SOG-rewrite analog,
    builder.py:520-522), else the reported value. The speed checksum is
    an integer millis sum — floor(x*1000+0.5) is the same IEEE ops in
    Spark, DuckDB, and numpy, so no float-order drift."""
    import math

    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
    val = pdf["value"].to_numpy()
    n_out = n_rw = 0
    n_kept = 1
    milli = int(math.floor(val[0] * 1000 + 0.5))
    prev_ts, prev_v = ts_us[0], val[0]
    for i in range(1, len(val)):
        dt_us = int(ts_us[i] - prev_ts)
        if dt_us == 0:
            n_out += 1
            continue
        rate = abs(val[i] - prev_v) / (dt_us / 1000000.0)
        if rate > CHAIN_RATE_THRESHOLD:
            n_out += 1
            continue
        n_kept += 1
        if abs(rate - val[i]) > REWRITE_DISAGREE:
            n_rw += 1
            milli += int(math.floor(rate * 1000 + 0.5))
        else:
            milli += int(math.floor(val[i] * 1000 + 0.5))
        prev_ts, prev_v = ts_us[i], val[i]
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_kept": [n_kept],
            "n_outliers": [n_out],
            "n_rewrites": [n_rw],
            "speed_milli": [milli],
        }
    )


@query(
    "chained_outlier_rewrite",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    walk AS (
      SELECT user_id, 1::BIGINT AS rn, n, ts AS prev_ts, value AS prev_value,
             0::BIGINT AS n_outliers, 1::BIGINT AS n_kept,
             0::BIGINT AS n_rewrites,
             CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS speed_milli
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.n,
             CASE WHEN x.is_out THEN w.prev_ts ELSE o.ts END,
             CASE WHEN x.is_out THEN w.prev_value ELSE o.value END,
             w.n_outliers + CASE WHEN x.is_out THEN 1 ELSE 0 END,
             w.n_kept + CASE WHEN x.is_out THEN 0 ELSE 1 END,
             w.n_rewrites + CASE WHEN NOT x.is_out
                  AND ABS(x.rate - o.value) > {REWRITE_DISAGREE}
                  THEN 1 ELSE 0 END,
             w.speed_milli + CASE WHEN x.is_out THEN 0
                  WHEN ABS(x.rate - o.value) > {REWRITE_DISAGREE}
                  THEN CAST(FLOOR(x.rate * 1000 + 0.5) AS BIGINT)
                  ELSE CAST(FLOOR(o.value * 1000 + 0.5) AS BIGINT) END
      FROM walk w
      JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1,
      LATERAL (SELECT
          ABS(o.value - w.prev_value)
            / (NULLIF(epoch_us(o.ts) - epoch_us(w.prev_ts), 0) / 1000000.0)
            AS rate,
          (epoch_us(o.ts) - epoch_us(w.prev_ts) = 0
           OR ABS(o.value - w.prev_value)
              / (NULLIF(epoch_us(o.ts) - epoch_us(w.prev_ts), 0) / 1000000.0)
              > {CHAIN_RATE_THRESHOLD}) AS is_out
      ) x
    )
    SELECT user_id, n_kept, n_outliers, n_rewrites, speed_milli
    FROM walk WHERE rn = n
    """,
)
def chained_outlier_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2's sequentially dependent half as a grouped-map kernel; the
    lag-only sibling (lag_outlier_detect) covers the vectorizable part.
    Scale shape: ONE shuffle on user_id, Arrow batches per group, no
    driver-side state — identical to every other grouped-map operator
    in the engine (merge_spj's kernel carries the same contract)."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("n_kept", T.LongType(), True),
            T.StructField("n_outliers", T.LongType(), True),
            T.StructField("n_rewrites", T.LongType(), True),
            T.StructField("speed_milli", T.LongType(), True),
        ]
    )
    return ev.groupBy("user_id").applyInPandas(
        _chained_outlier_kernel, out_schema
    )


def sessionized(ev: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """W3 as a reusable operator: lag -> gap flag -> running sum =
    session id (classic sessionization; the reference's gap-split loop,
    builder.py:102-115). One shuffle on user_id; both windows share it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap >= gap_s), 1).otherwise(0)
    return ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


# ---------------------------------------------------------------------------
# W3 + W5: gap-based sessionization + min-points guard
# (builder.py:102-115 split; builder.py:34,195-196 "> 2 points" guard).
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN (epoch_us(ts) // 1000000) - (epoch_us(LAG(ts) OVER w) // 1000000) >= {SESSION_GAP_S}
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             (SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_points,
           ((epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000))::BIGINT AS duration_s,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    HAVING COUNT(*) > 2
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize then aggregate per session; sessions with <= 2 points
    dropped (the reference's POINTS_FOR_TRAJECTORY_THRESHOLD). The
    streaming twin is streaming/ingest.sessionized_domain_counts
    (session_window) — note Spark's session_window splits at Δt > gap
    while this operator follows the reference's Δt >= gap; on
    whole-second data pass gap-1s to the streaming form (convergence
    pinned by tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionized(ev)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("session_value"),
        )
        .filter(F.col("n_points") > 2)
    )


# ---------------------------------------------------------------------------
# W6: sequential-duplicate compression — keep rows where the value changed
# vs the previous row (builder.py:361-367 stepwise tfloat dedup).
# ---------------------------------------------------------------------------
@query(
    "seq_dedup_compress",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN prev_type IS NULL OR event_type <> prev_type THEN 1 END) AS n_changes
    FROM lagged GROUP BY user_id
    """,
)
def seq_dedup_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(col) != col filter — run-length compression of a stepwise
    signal as a pure window expression."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return lagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(
            F.when(
                F.col("prev_type").isNull()
                | (F.col("event_type") != F.col("prev_type")),
                1,
            )
        ).alias("n_changes"),
    )


# ---------------------------------------------------------------------------
# W8: top-1 per group (/root/reference/etl/partition_builder/
# 02_kd_tree_construction.sql:44-48 ORDER BY numPoints DESC LIMIT 1).
# ---------------------------------------------------------------------------
@query(
    "top1_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey AS top_orderkey,
           CAST(o_totalprice AS DOUBLE) AS top_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number()=1 with a deterministic tiebreak — at scale this
    beats orderBy().limit() because it never globally sorts."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").cast("double").alias("top_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# LWW dedup — the CDC core pattern (SURVEY.md A2 note: row_number over
# (partition by key order by ts desc) = 1), over the events table.
# ---------------------------------------------------------------------------
@query(
    "lww_latest_event",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS last_event_id,
           ts AS last_ts, ROUND(CAST(value AS DOUBLE), 4) AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def lww_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins per (user_id, event_type) via the engine's
    skew-resistant max(struct) dedup operator (operators/dedup.py) —
    aggregate form gets a map-side partial the window form lacks."""
    from etl_spark.operators.dedup import lww_dedup

    ev = load_table(spark, sf_dir, "events")
    winners = lww_dedup(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return winners.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.round(F.col("value").cast("double"), 4).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# W9-successor: deterministic surrogate ids — xxhash64 instead of the
# reference's random-with-collision-retry id generator
# (/root/reference/etl/insert/insert_trajectories.py:30-50). No SQL oracle
# (xxhash64 is Spark-specific); checked by uniqueness-count instead.
# ---------------------------------------------------------------------------
@query(
    "deterministic_ids",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys
    FROM orders
    """,
)
def deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 surrogate ids are injective in practice on this keyspace:
    assert distinct-id count == distinct-key count (the property the
    reference's own tests pin for its random ids)."""
    o = load_table(spark, sf_dir, "orders")
    ids = o.select(F.xxhash64("o_orderkey").alias("sid"), "o_orderkey")
    return ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("sid").alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# W4: the stop/move state machine — the reference alternates stopped/moving
# sub-trajectories when speed stays below a threshold long enough
# (/root/reference/etl/trajectory/builder.py:118-178,393-425, thresholds
# :31-32). Re-expressed as pure windows: state flag -> run-change marker ->
# running-sum run id -> per-run duration -> qualifying-run filter. No
# per-row Python, one shuffle on the key.
# ---------------------------------------------------------------------------
STOP_VALUE_THRESHOLD = 50.0  # "speed < 0.5 kn" analog on the value column
STOP_MIN_DURATION_S = 600  # "for >= 300 s" analog


@query(
    "stop_move_segments",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             (value < {STOP_VALUE_THRESHOLD}) AS is_stop,
             CASE WHEN LAG(value < {STOP_VALUE_THRESHOLD}) OVER w IS NULL
                  OR (value < {STOP_VALUE_THRESHOLD}) <> LAG(value < {STOP_VALUE_THRESHOLD}) OVER w
                  THEN 1 ELSE 0 END AS run_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, is_stop,
             SUM(run_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), segs AS (
      SELECT user_id, run_id, is_stop,
             COUNT(*) AS n_points,
             ((epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000))::BIGINT AS duration_s
      FROM runs GROUP BY user_id, run_id, is_stop
    )
    SELECT user_id,
           COUNT(CASE WHEN is_stop AND duration_s >= {STOP_MIN_DURATION_S} THEN 1 END) AS n_stopped_segments,
           COUNT(CASE WHEN NOT is_stop THEN 1 END) AS n_moving_segments,
           SUM(CASE WHEN is_stop AND duration_s >= {STOP_MIN_DURATION_S} THEN n_points ELSE 0 END)::BIGINT AS stopped_points
    FROM segs GROUP BY user_id
    """,
)
def stop_move_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 as windows: below-threshold runs lasting >= the minimum
    duration count as 'stopped' segments (the builder's mutually
    recursive split loop collapses into two window passes + an agg)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_stop = F.col("value") < STOP_VALUE_THRESHOLD
    prev_stop = F.lag(is_stop).over(w)
    run_start = F.when(prev_stop.isNull() | (is_stop != prev_stop), 1).otherwise(0)
    runs = ev.select(
        "user_id",
        "ts",
        "event_id",
        is_stop.alias("is_stop"),
        F.sum(run_start)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    segs = runs.groupBy("user_id", "run_id", "is_stop").agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
    )
    stopped_ok = F.col("is_stop") & (F.col("duration_s") >= STOP_MIN_DURATION_S)
    return segs.groupBy("user_id").agg(
        F.count(F.when(stopped_ok, 1)).alias("n_stopped_segments"),
        F.count(F.when(~F.col("is_stop"), 1)).alias("n_moving_segments"),
        F.sum(F.when(stopped_ok, F.col("n_points")).otherwise(0)).alias(
            "stopped_points"
        ),
    )
