"""Relational operator battery — SURVEY.md §2.2 (filters/projections),
§2.3 (joins), §2.4 (aggregations), §2.7 (set ops), §2.8 (scalar fns),
re-expressed over the TPC-H-ish test tables.

Each query is the Spark twin of a reference operator (file:line cited
per function) written so Catalyst gets the whole plan: filters push
into the parquet scan, small dimensions broadcast, aggregates get
map-side partials. Exact-arithmetic discipline: money goes through
DECIMAL(18,2) and is cast to DOUBLE once at the end (see
queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.queries import query
from etl_spark.sources.readers import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# A5/F1: grouped multi-aggregate behind a pushed-down filter — the shape of
# the reference's heatmap measures (/root/reference/etl/rollup/sql/heatmaps/
# 01_count.sql:44, 04_max_draught.sql:44) over a cleaned scan
# (clean_data.py:123-149).
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down range filter + hash aggregate with partial combine.
    At 100 TB this is scan-bound: the filter and the 7-column pruning
    both reach the parquet reader (verify: PushedFilters/ReadSchema in
    .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J2/J4: fact ⋈ broadcast dimension chain — the reference's rollup read joins
# (/root/reference/etl/rollup/sql/heatmaps/01_count.sql:46-48) and ensure-time
# dim joins (ship_dimension.py:71).
# ---------------------------------------------------------------------------
@query(
    "dim_join_enrich",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def dim_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast hash joins (25-row nation, 5-row region — the
    Citus reference-table analog, 50_citus_distribution.sql:2-12): zero
    shuffles before the final aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# A6: two-level hierarchical re-aggregation — fine key first, parent key
# second (/root/reference/etl/rollup/sql/heatmaps/01_count.sql:50-52).
# ---------------------------------------------------------------------------
@query(
    "two_level_rollup",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             (EXTRACT(year FROM o_orderdate) * 100 + EXTRACT(month FROM o_orderdate))::INT AS order_month,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_total
      FROM orders GROUP BY o_custkey, order_month
    )
    SELECT order_month,
           COUNT(*) AS n_active_customers,
           SUM(n_orders)::BIGINT AS n_orders,
           CAST(MAX(cust_total) AS DOUBLE) AS max_customer_total
    FROM per_cust GROUP BY order_month
    """,
    # out of the driver's 50-row window: subsumed by rollup_cascade
    # (same partial->final split, chained over four levels); still
    # oracle-checked by the local parity suite and timed by bench.py
    driver=False,
)
def two_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(fine) then groupBy(coarse): the second shuffle is over
    already-reduced data (|customers x months| rows), mirroring the
    partial->final split the reference hand-writes."""
    o = load_table(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    per_cust = (
        o.groupBy(F.col("o_custkey"), month.alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("cust_total"),
        )
    )
    return per_cust.groupBy("order_month").agg(
        F.count(F.lit(1)).alias("n_active_customers"),
        F.sum("n_orders").alias("n_orders"),
        F.max("cust_total").alias("max_customer_total"),
    )


# ---------------------------------------------------------------------------
# A6 (full hierarchy): the reference materializes its rollup at FOUR
# cell sizes, each level's parent key an integer division of the finer
# key (5000->1000->200->50, /root/reference/etl/rollup/
# apply_rollups.py:129-135; parent keys 01_count.sql:50-52). Here the
# hierarchy is temporal — minute -> hour -> day -> week — and each
# level is computed FROM THE PREVIOUS LEVEL's already-reduced rows, so
# re-aggregation cost shrinks geometrically instead of re-scanning the
# base table per level (what the reference pays by recomputing every
# cell size from staging).
# ---------------------------------------------------------------------------
@query(
    "rollup_cascade",
    oracle="""
    WITH lvl_minute AS (
      SELECT epoch_us(ts) // 60000000 AS bucket_id,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,4))) AS sum_value,
             MAX(value) AS max_value
      FROM events GROUP BY bucket_id
    ), lvl_hour AS (
      SELECT bucket_id // 60 AS bucket_id,
             SUM(n_events)::BIGINT AS n_events,
             SUM(sum_value) AS sum_value,
             MAX(max_value) AS max_value
      FROM lvl_minute GROUP BY 1
    ), lvl_day AS (
      SELECT bucket_id // 24 AS bucket_id,
             SUM(n_events)::BIGINT AS n_events,
             SUM(sum_value) AS sum_value,
             MAX(max_value) AS max_value
      FROM lvl_hour GROUP BY 1
    ), lvl_week AS (
      SELECT bucket_id // 7 AS bucket_id,
             SUM(n_events)::BIGINT AS n_events,
             SUM(sum_value) AS sum_value,
             MAX(max_value) AS max_value
      FROM lvl_day GROUP BY 1
    )
    SELECT 'minute' AS level, bucket_id, n_events,
           CAST(sum_value AS DOUBLE) AS sum_value, max_value FROM lvl_minute
    UNION ALL
    SELECT 'hour', bucket_id, n_events,
           CAST(sum_value AS DOUBLE), max_value FROM lvl_hour
    UNION ALL
    SELECT 'day', bucket_id, n_events,
           CAST(sum_value AS DOUBLE), max_value FROM lvl_day
    UNION ALL
    SELECT 'week', bucket_id, n_events,
           CAST(sum_value AS DOUBLE), max_value FROM lvl_week
    """,
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-level chained materialization. Sums ride DECIMAL through
    every level (exact, order-independent) and surface as DOUBLE once;
    bucket keys are integer `div` — double division could mis-bucket at
    exact boundaries. At warehouse scale each level is an idempotent
    MERGE target (the rollup.py bucket-partial pattern); here the
    cascade itself is the unit under test."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.expr("unix_micros(ts) div 60000000").alias("bucket_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        F.max("value").alias("max_value"),
    )

    def _up(df: DataFrame, k: int) -> DataFrame:
        return df.groupBy(
            F.expr(f"bucket_id div {k}").alias("bucket_id")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.max("max_value").alias("max_value"),
        )

    hour = _up(minute, 60)
    day = _up(hour, 24)
    week = _up(day, 7)

    def _out(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            "bucket_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value").cast("double").alias("sum_value"),
            "max_value",
        )

    return (
        _out(minute, "minute")
        .unionByName(_out(hour, "hour"))
        .unionByName(_out(day, "day"))
        .unionByName(_out(week, "week"))
    )


# ---------------------------------------------------------------------------
# A7: group-by on expression keys (/root/reference/etl/rollup/sql/heatmaps/
# 01_count.sql:52 — GROUP BY cell_x/(…), …).
# ---------------------------------------------------------------------------
@query(
    "expr_key_agg",
    oracle="""
    SELECT CAST(FLOOR(l_quantity / 10) AS INT) AS qty_bucket,
           CAST(FLOOR(l_discount * 100 / 2) AS INT) AS disc_bucket,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY qty_bucket, disc_bucket
    """,
)
def expr_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic bucketing as the grouping key — the same trick that
    replaces the reference's spatial theta-join with an equi-join
    (SURVEY.md J6): compute the bucket, group on it."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("int").alias("qty_bucket"),
            F.floor(F.col("l_discount") * 100 / 2).cast("int").alias("disc_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A2: most-frequent value per group with deterministic tiebreak —
# the reference's per-trajectory attribute vote
# (/root/reference/etl/trajectory/builder.py:378-390).
# ---------------------------------------------------------------------------
@query(
    "mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ), ranked AS (
      SELECT user_id, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS modal_type, cnt AS modal_count
    FROM ranked WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count -> row_number over (cnt desc, value asc) = 1. Unlike
    pandas value_counts (insertion-order ties, builder.py:378-390) the
    tiebreak is explicit, so the result is replay-stable."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("cnt").alias("modal_count"),
        )
    )


# ---------------------------------------------------------------------------
# A4/U3: multi-column unpivot + distinct (/root/reference/etl/insert/
# dimensions/date_dimension.py:26-32 — stack().unique() over 3 date cols).
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# J12 (semi + anti), one driver row: the two halves of the reference's
# ensure probe — rows whose probed id is null (insert half,
# bulk_inserter.py:99) and rows that pass an allow-list probe (the
# spatial semi of clean_data.py:63-66, relational form). Each side
# keeps its own join strategy; the union is a tagged concatenation, so
# both operators stay independently proven under one gate row.
# ---------------------------------------------------------------------------
@query(
    "semi_anti_probe",
    oracle="""
    SELECT 'anti' AS side, c.c_custkey AS key, c.c_mktsegment AS attr
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'semi' AS side, s.s_suppkey AS key, s.s_name AS attr
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
)
def semi_anti_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti (insert-only half of a MERGE) unioned with left_semi
    against a pushed-down-filtered probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.lit("anti").alias("side"),
            F.col("c_custkey").alias("key"),
            F.col("c_mktsegment").alias("attr"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    semi = (
        s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
        .select(
            F.lit("semi").alias("side"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("attr"),
        )
    )
    return anti.unionByName(semi)


# ---------------------------------------------------------------------------
# J9: small-dim cross join (/root/reference/etl/init/sql/13_dim_direction.sql:
# 12-22 — 5x5 direction cross product).
# ---------------------------------------------------------------------------
@query(
    "cross_join_dims",
    oracle="""
    SELECT r.r_name AS from_region, r2.r_name AS to_region,
           (r.r_regionkey * 5 + r2.r_regionkey) AS direction_id
    FROM region r CROSS JOIN region r2
    """,
    # out of the driver's 50-row window (slot ceded to the round-5
    # chained-outlier / cascade / pruned-scan rows): init-time-only
    # operator, still oracle-checked by the local parity suite
    driver=False,
)
def cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Init-time-only cross product of a tiny dim with a computed
    surrogate key (the reference's dim_direction build)."""
    r = load_table(spark, sf_dir, "region")
    r2 = r.select(
        F.col("r_regionkey").alias("r2_regionkey"), F.col("r_name").alias("r2_name")
    )
    return r.crossJoin(r2).select(
        F.col("r_name").alias("from_region"),
        F.col("r2_name").alias("to_region"),
        (F.col("r_regionkey") * 5 + F.col("r2_regionkey")).alias("direction_id"),
    )


# ---------------------------------------------------------------------------
# U1 + A4, one driver row: union + distinct over two key sets
# (/root/reference/etl/insert/dimensions/date_dimension.py:48-51 —
# fixed ∪ easter holidays) and unpivot-via-union + distinct over two
# date columns (the ensure-dates feed, date_dimension.py:26-51). Each
# side keeps its own pruned scans and its own hash-distinct; the tag
# column keeps the two result sets separable under one gate row.
# ---------------------------------------------------------------------------
@query(
    "set_ops_distinct",
    oracle="""
    SELECT 'nation' AS setop, CAST(nationkey AS VARCHAR) AS val FROM (
      SELECT DISTINCT n_nationkey AS nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS n_nationkey FROM supplier
      )
    )
    UNION ALL
    SELECT 'date' AS setop, strftime(day, '%Y-%m-%d') AS val FROM (
      SELECT DISTINCT CAST(d AS DATE) AS day
      FROM (
        SELECT o_orderdate AS d FROM orders
        UNION ALL
        SELECT l_shipdate AS d FROM lineitem
      )
    )
    """,
)
def set_ops_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct, twice: nation keys from two tables, and
    the unpivoted distinct dates (union, not explode: each source keeps
    its own pruned scan)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    nations = (
        c.unionByName(s)
        .distinct()
        .select(
            F.lit("nation").alias("setop"),
            F.col("nationkey").cast("string").alias("val"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderdate").alias("d"))
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_shipdate").alias("d"))
    dates = (
        o.unionByName(li)
        .select(F.col("d").cast("date").alias("day"))
        .distinct()
        .select(
            F.lit("date").alias("setop"),
            F.date_format("day", "yyyy-MM-dd").alias("val"),
        )
    )
    return nations.unionByName(dates)


# ---------------------------------------------------------------------------
# C1/C2/C4: smart date keys + calendar attributes (/root/reference/etl/
# helper_functions.py:167-198, date_dimension.py:63-70).
# ---------------------------------------------------------------------------
@query(
    "smart_date_keys",
    oracle="""
    SELECT DISTINCT
      COALESCE((EXTRACT(year FROM o_orderdate)*10000
         + EXTRACT(month FROM o_orderdate)*100
         + EXTRACT(day FROM o_orderdate))::INT, -1) AS date_id,
      EXTRACT(year FROM o_orderdate)::INT AS year,
      EXTRACT(month FROM o_orderdate)::INT AS month,
      EXTRACT(day FROM o_orderdate)::INT AS day_of_month,
      EXTRACT(quarter FROM o_orderdate)::INT AS quarter,
      EXTRACT(isodow FROM o_orderdate)::INT AS iso_dow,
      EXTRACT(doy FROM o_orderdate)::INT AS day_of_year,
      strptime(lpad((EXTRACT(year FROM o_orderdate)*10000
         + EXTRACT(month FROM o_orderdate)*100
         + EXTRACT(day FROM o_orderdate))::VARCHAR, 8, '0') || '120000',
         '%Y%m%d%H%M%S') AS reconstructed
    FROM orders
    """,
)
def smart_date_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated date dimension: smart surrogate key + extracted
    attributes, all JVM expressions (no stored dim table needed —
    SURVEY.md §7.3.1) — plus the C3 inverse (timestamp back from the
    smart key via lpad+concat+to_timestamp, noon time_id fixed so the
    roundtrip is total; 01_smart_date_time_id.sql:1-11)."""
    from etl_spark.functions.keys import smart_date_id

    o = load_table(spark, sf_dir, "orders")
    # distinct FIRST: the 8 attribute expressions then run once per
    # distinct date and the shuffle carries one date column, not an
    # 8-column-wide hash-distinct over every orders row. (smart_date_id
    # maps a null date to -1; the oracle COALESCEs identically.)
    dates = o.select("o_orderdate").distinct()
    d = F.col("o_orderdate")
    did = smart_date_id(d)
    return dates.select(
        did.alias("date_id"),
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day_of_month"),
        F.quarter(d).alias("quarter"),
        # ISO dow: Monday=1..Sunday=7 (Spark dayofweek is Sunday=1)
        (F.pmod(F.dayofweek(d) + 5, F.lit(7)) + 1).cast("int").alias("iso_dow"),
        F.dayofyear(d).alias("day_of_year"),
        F.to_timestamp(
            F.concat(F.lpad(did.cast("string"), 8, "0"), F.lit("120000")),
            "yyyyMMddHHmmss",
        ).alias("reconstructed"),
    )


# ---------------------------------------------------------------------------
# C18/C17: CASE WHEN fallback chain (/root/reference/etl/trajectory/
# builder.py:309-331 — A+B -> length fallback) + null sentinel (F6).
# ---------------------------------------------------------------------------
@query(
    "case_when_fallback",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size IS NOT NULL AND p_size > 0 THEN p_size
                WHEN p_retailprice > 1500 THEN 50
                ELSE -1 END AS effective_size,
           CASE WHEN p_type LIKE 'PROMO%' THEN 'promo'
                WHEN p_type LIKE 'STANDARD%' THEN 'standard'
                ELSE 'other' END AS type_class
    FROM part
    """,
)
def case_when_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chains with the reference's -1 null sentinel."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.when(F.col("p_size").isNotNull() & (F.col("p_size") > 0), F.col("p_size"))
        .when(F.col("p_retailprice") > 1500, F.lit(50))
        .otherwise(F.lit(-1))
        .alias("effective_size"),
        F.when(F.col("p_type").startswith("PROMO"), F.lit("promo"))
        .when(F.col("p_type").startswith("STANDARD"), F.lit("standard"))
        .otherwise(F.lit("other"))
        .alias("type_class"),
    )


# ---------------------------------------------------------------------------
# F3/C10-analog: lossy cast out of a JSON-ish payload (/root/reference/etl/
# cleaning/clean_data.py:116 to_numeric(errors='coerce');
# fact_cell_rollup.sql:61-74 JSON map handling).
# ---------------------------------------------------------------------------
@query(
    "json_extract_cast",
    oracle="""
    SELECT TRY_CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_bucket
    """,
)
def json_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + try_cast (null on failure) + agg — the
    lossy-cast clean step as pure Catalyst expressions. try_cast, not
    cast: under ANSI mode (Spark 4 default) a plain cast of the ''
    that regexp_extract returns on no-match ABORTS the job instead of
    bucketing to null — DuckDB's TRY_CAST is the exact twin."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k": (-?[0-9]+)', 1).try_cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# C6: calculate_delta_upperbounded — the reference's circular-delta kernel
# (/root/reference/etl/init/single_statement_sql/
# calculate_delta_upperbounded.sql:1-28): Σ min(d, ub−d) over consecutive
# absolute differences, empty/1-elem -> 0. Golden-testable (SURVEY.md C6).
# ---------------------------------------------------------------------------
@query(
    "delta_upperbounded",
    oracle="""
    WITH seqs AS (
      SELECT user_id, array_agg(value ORDER BY ts, event_id) AS vals
      FROM events WHERE event_type = 'view' GROUP BY user_id
    )
    SELECT user_id,
           len(vals) AS n_points,
           ROUND(CASE WHEN len(vals) < 2 THEN 0.0 ELSE
             list_sum(list_transform(range(1, len(vals)),
               i -> LEAST(((vals[i+1] - vals[i]) % 360.0 + 360.0) % 360.0,
                          360.0 - ((vals[i+1] - vals[i]) % 360.0 + 360.0) % 360.0)))
           END, 4) AS total_delta
    FROM seqs
    """,
)
def delta_upperbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect ordered array per key, then the shared circular-delta
    kernel (functions/keys.py delta_upperbounded — pmod form, the
    reference's exact semantics). A bare least(|d|, ub-|d|) is NOT that
    kernel: for |d| > ub it turns NEGATIVE and subtracts from the sum
    (real pairs in the bench data hit |d| up to 464); pmod folds the
    difference into [0, ub) first, so every contribution is the true
    circular distance."""
    from etl_spark.functions.keys import delta_upperbounded as circ_delta

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    seqs = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
        ).alias("rows")
    )
    vals = F.col("rows.value")
    return seqs.select(
        "user_id",
        F.size(vals).alias("n_points"),
        F.round(circ_delta(vals, 360.0), 4).alias("total_delta"),
    )
