"""Remaining join-family operators from SURVEY.md §2.3 not covered by
the first battery: composite-key + range-predicate join (J5/J11),
enrichment left join with sentinel fill (J3/F6), windowed range scan
with pruning-friendly predicates (F8), and deterministic sampling
(the replay-stable successor of W10's ORDER BY random())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.queries import query
from etl_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# J5 + J11: composite equi-join with an additional range predicate — the
# reference's fact<->dim two-key join (staging_split_trajectories.sql:28)
# plus its bbox-overlap reads (cell_query.sql:11-14).
# ---------------------------------------------------------------------------
@query(
    "composite_range_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lineitems,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def composite_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key carries the join (one hash/SMJ shuffle pair); the range
    predicate evaluates post-match — never a theta join. At lake scale
    both sides bucket on orderkey and this becomes a storage-partitioned
    join with zero shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        # full-timestamp interval arithmetic, like the oracle: a
        # date_add on the DATE cast would silently truncate any
        # time-of-day component off the upper bound
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# J3 + F6: enrichment left join with sentinel fill — the reference's
# mid_map flag lookup (ship_dimension.py:44-50: left join + fillna).
# ---------------------------------------------------------------------------
@query(
    "enrich_left_fillna",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
           COALESCE(r.r_name, 'UNKNOWN') AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_nationkey < 20
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def enrich_left_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast left joins + coalesce sentinels; the pruned dim
    (n_nationkey < 20) forces real null rows through the fill path."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    r = load_table(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left").join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left"
    )
    return j.select(
        "c_custkey",
        F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_name"),
        F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region_name"),
    )


# ---------------------------------------------------------------------------
# F8: spatio-temporal window read recast — range predicates on (ts, value)
# that Parquet min/max stats can prune (cell_query.sql:11-14's bbox && box).
# ---------------------------------------------------------------------------
@query(
    "range_window_scan",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
      AND value BETWEEN 50 AND 300
    GROUP BY event_type
    """,
)
def range_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four range predicates reach the scan (PushedFilters) so
    row-group min/max stats skip non-overlapping chunks — the columnar
    replacement for the reference's SP-GiST bbox indexes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
            & F.col("value").between(50, 300)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# W10-successor: deterministic sampling — ORDER BY md5(key) instead of the
# reference's ORDER BY random() (random_garbage_parameters.sql:19-20),
# so benchmark parameter sampling is replay-stable.
# ---------------------------------------------------------------------------
@query(
    "deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY md5(o_orderkey::VARCHAR) ASC
    LIMIT 20
    """,
    # out of the driver's 50-row window (slot ceded to the round-5
    # chained-outlier / cascade / pruned-scan rows): the reference's W10
    # is bench-harness-only sampling; still oracle-checked locally
    driver=False,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-ordered top-n = a uniform-ish sample that is identical on
    every engine and every replay (SURVEY.md §7.5 non-determinism ban:
    never rand() in a data path)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")).asc())
        .limit(20)
    )
