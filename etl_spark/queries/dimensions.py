"""Dimension-generation and rollup-shape queries — SURVEY.md §2.8
scalar-function twins (smart keys C1-C3, calendar attrs C4, Easter C5,
generate_series C20), the ensure-dimension pattern (K2/K3), and the
rasterless heatmap rollup + map-algebra (A8/G12).

The reference stores dim_date/dim_time and fills them with SQL; this
engine *generates* them from expressions (no stored state to drift).
Easter uses the anonymous Gregorian computus — pure integer
arithmetic, identical in both engines (the reference's plpgsql UDTF
calculate_easter.sql:1-60 re-expressed as a column expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.queries import query
from etl_spark.sources.readers import load_table

# Holiday offsets from Easter Sunday (the reference emits 6 rows per
# year: Maundy Thursday .. Whit Monday).
EASTER_OFFSETS = (-3, -2, 0, 1, 39, 50)


def _idiv(a, b: int):
    """Integer division for non-negative operands (portable: DuckDB //)."""
    return F.floor(a / F.lit(b)).cast("int")


def easter_month_day(year):
    """Anonymous Gregorian computus: year -> (month, day) columns."""
    y = year
    a = y % 19
    b = _idiv(y, 100)
    c = y % 100
    d = _idiv(b, 4)
    e = b % 4
    f = _idiv(b + 8, 25)
    g = _idiv(b - f + 1, 3)
    h = (19 * a + b - d - g + 15) % 30
    i = _idiv(c, 4)
    k = c % 4
    ll = (32 + 2 * e + 2 * i - h - k) % 7
    m = _idiv(a + 11 * h + 22 * ll, 451)
    month = _idiv(h + ll - 7 * m + 114, 31)
    day = ((h + ll - 7 * m + 114) % 31) + 1
    return month, day


_EASTER_SQL = """
      SELECT year,
             ((h + l - 7*m + 114) // 31) AS e_month,
             ((h + l - 7*m + 114) % 31) + 1 AS e_day
      FROM (
        SELECT year, h, l,
               (a + 11*h + 22*l) // 451 AS m
        FROM (
          SELECT year, a,
                 (19*a + b - (b//4) - ((b - ((b+8)//25) + 1)//3) + 15) % 30 AS h,
                 (32 + 2*(b%4) + 2*((year%100)//4) - ((19*a + b - (b//4) - ((b - ((b+8)//25) + 1)//3) + 15) % 30) - (year%100)%4) % 7 AS l
          FROM (
            SELECT year, year % 19 AS a, year // 100 AS b
            FROM (SELECT DISTINCT EXTRACT(year FROM o_orderdate)::INT AS year FROM orders)
          )
        )
      )
"""


# ---------------------------------------------------------------------------
@query(
    "easter_holidays",
    oracle=f"""
    WITH easter AS ({_EASTER_SQL})
    SELECT year,
           unnest([{", ".join(str(o) for o in EASTER_OFFSETS)}]) AS offset_days,
           (make_date(year, e_month, e_day)
             + unnest([{", ".join(str(o) for o in EASTER_OFFSETS)}]) * INTERVAL 1 DAY)::DATE
             AS holiday
    FROM easter
    """,
)
def easter_holidays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: the Easter UDTF as expressions + explode — 6 holiday rows
    per distinct year in the data."""
    o = load_table(spark, sf_dir, "orders")
    years = o.select(F.year("o_orderdate").alias("year")).distinct()
    month, day = easter_month_day(F.col("year"))
    easter = years.select("year", F.make_date(F.col("year"), month, day).alias("e"))
    # carry `e` through the explode — no self-join needed to recover it
    return easter.select(
        "year",
        F.explode(F.array(*[F.lit(o_) for o_ in EASTER_OFFSETS])).alias("offset_days"),
        "e",
    ).select(
        "year",
        "offset_days",
        F.date_add(F.col("e"), F.col("offset_days")).alias("holiday"),
    )


# ---------------------------------------------------------------------------
@query(
    "time_dim_generate",
    oracle="""
    SELECT (h * 10000 + m * 100 + s)::INT AS time_id,
           h::INT AS hour, m::INT AS minute, s::INT AS second,
           CASE WHEN h < 12 THEN 'AM' ELSE 'PM' END AS meridiem
    FROM (
      SELECT i // 3600 AS h, (i % 3600) // 60 AS m, i % 60 AS s
      FROM (SELECT unnest(range(0, 86400)) AS i)
    )
    """,
)
def time_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: the 86 400-row time dimension from spark.range — generated,
    never stored (the reference pre-fills a table, 11_dim_time.sql:15-24)."""
    r = spark.range(86400)
    i = F.col("id")
    h, m, s = _idiv(i, 3600), _idiv(i % 3600, 60), (i % 60).cast("int")
    return r.select(
        (h * 10000 + m * 100 + s).cast("int").alias("time_id"),
        h.alias("hour"),
        m.alias("minute"),
        s.alias("second"),
        F.when(h < 12, "AM").otherwise("PM").alias("meridiem"),
    )


# ---------------------------------------------------------------------------
# C3 (timestamp_roundtrip) folded into relational.smart_date_keys since
# r4 — the smart-key inverse is proven there as the `reconstructed`
# column, freeing a driver-gate slot.
# ---------------------------------------------------------------------------
@query(
    "ensure_dim_domains",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT 'site' || (CASE WHEN doc_id % 10 < 6 THEN 0 ELSE doc_id % 10 END)
               || '.example' AS domain
      FROM documents WHERE doc_id % 2 = 0
    ),
    incoming AS (
      SELECT DISTINCT 'site' || (CASE WHEN doc_id % 10 < 6 THEN 0 ELSE doc_id % 10 END)
               || '.example' AS domain
      FROM documents
    )
    SELECT domain,
           substr(md5(domain), 1, 16) AS domain_sk,
           (domain IN (SELECT domain FROM existing)) AS preexisting
    FROM incoming
    """,
)
def ensure_dim_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K3: the ensure-dimension pattern — probe existing natural
    keys, insert only the misses, surrogate keys DETERMINISTIC (md5 of
    the natural key) instead of the reference's serial ids + retry loop
    (bulk_inserter.py:59-113, insert_trajectories.py:30-50). Expressed
    as existing ∪ (incoming anti-join existing); in the lake the same
    plan feeds a MERGE WHEN NOT MATCHED INSERT."""
    d = load_table(spark, sf_dir, "documents")
    dom = F.concat(
        F.lit("site"),
        F.when(F.col("doc_id") % 10 < 6, F.lit(0))
        .otherwise(F.col("doc_id") % 10)
        .cast("string"),
        F.lit(".example"),
    )
    existing = d.filter(F.col("doc_id") % 2 == 0).select(dom.alias("domain")).distinct()
    incoming = d.select(dom.alias("domain")).distinct()
    missing = incoming.join(existing, "domain", "left_anti").withColumn(
        "preexisting", F.lit(False)
    )
    present = existing.withColumn("preexisting", F.lit(True))
    ensured = present.unionByName(missing)
    return ensured.select(
        "domain",
        F.substring(F.md5(F.col("domain")), 1, 16).alias("domain_sk"),
        "preexisting",
    )


# ---------------------------------------------------------------------------
@query(
    "heatmap_pixels",
    oracle="""
    SELECT (user_id % 32)::INT AS px,
           (CAST(FLOOR(value) AS BIGINT) % 32)::INT AS py,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'click'
    GROUP BY px, py
    """,
)
def heatmap_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/G12: the rasterless heatmap — long-format (px, py, value)
    rows with groupBy instead of a raster type + ST_Union UDAF
    (01_count.sql:18-26). Parquet min/max on (px, py) gives the
    bbox-read pruning the reference gets from raster tiles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return (
        ev.groupBy(
            (F.col("user_id") % 32).cast("int").alias("px"),
            (F.floor("value").cast("bigint") % 32).cast("int").alias("py"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "heatmap_mapalgebra",
    oracle="""
    WITH a AS (
      SELECT (user_id % 32)::INT AS px, (CAST(FLOOR(value) AS BIGINT) % 32)::INT AS py,
             COUNT(*) AS cnt
      FROM events WHERE event_type = 'click' GROUP BY px, py
    ),
    b AS (
      SELECT (user_id % 32)::INT AS px, (CAST(FLOOR(value) AS BIGINT) % 32)::INT AS py,
             COUNT(*) AS cnt
      FROM events WHERE event_type = 'view' GROUP BY px, py
    )
    SELECT COALESCE(a.px, b.px) AS px, COALESCE(a.py, b.py) AS py,
           COALESCE(a.cnt, 0) - COALESCE(b.cnt, 0) AS diff
    FROM a FULL OUTER JOIN b ON a.px = b.px AND a.py = b.py
    """,
)
def heatmap_mapalgebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12 map-algebra (A − B): full-outer join on pixel coordinates in
    place of ST_MapAlgebra over rasters (mapalgebra.sql:2,7,59). The
    reference colocates rasters by partition_id to make the self-join
    local — here both layers share the (px, py) grouping key, so the
    join reuses the aggregation's hash partitioning with no extra
    shuffle."""
    ev = load_table(spark, sf_dir, "events")

    def layer(t):
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy(
                (F.col("user_id") % 32).cast("int").alias("px"),
                (F.floor("value").cast("bigint") % 32).cast("int").alias("py"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    a = layer("click").withColumnRenamed("cnt", "a_cnt")
    b = layer("view").withColumnRenamed("cnt", "b_cnt")
    # USING-style full outer join: Spark auto-coalesces the key columns,
    # and keeping their names intact lets Catalyst reuse the
    # aggregations' (px, py) hash partitioning for the join
    return a.join(b, ["px", "py"], "full_outer").select(
        "px",
        "py",
        (F.coalesce(F.col("a_cnt"), F.lit(0)) - F.coalesce(F.col("b_cnt"), F.lit(0))).alias(
            "diff"
        ),
    )


# ---------------------------------------------------------------------------
@query(
    "argmin_map_key",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             ABS(o_totalprice - 0)      AS d_s,
             ABS(o_totalprice - 150000) AS d_n,
             ABS(o_totalprice - 50000)  AS d_e,
             ABS(o_totalprice - 100000) AS d_w
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN d_s <= d_n AND d_s <= d_e AND d_s <= d_w THEN 'South'
                WHEN d_n <= d_e AND d_n <= d_w THEN 'North'
                WHEN d_e <= d_w THEN 'East'
                ELSE 'West' END AS nearest
    FROM d
    """,
)
def argmin_map_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7/C9: argmin over a small fixed key->value map (the reference's
    get_lowest_json_key over the 4 cell-edge distances,
    fact_cell_rollup.sql:61-74) — a least/when chain, no JSON, no UDF.
    Tie order matches the CASE order (S, N, E, W)."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    d_s, d_n = F.abs(p - 0), F.abs(p - 150000)
    d_e, d_w = F.abs(p - 50000), F.abs(p - 100000)
    nearest = (
        F.when((d_s <= d_n) & (d_s <= d_e) & (d_s <= d_w), "South")
        .when((d_n <= d_e) & (d_n <= d_w), "North")
        .when(d_e <= d_w, "East")
        .otherwise("West")
    )
    return o.select("o_orderkey", nearest.alias("nearest"))


# ---------------------------------------------------------------------------
# Role-playing date dimension (/root/reference/etl/init/sql/
# 10_dim_date.sql:26-49: dim_date re-exposed as per-role views): ONE
# generated date dimension joined twice under two roles — the order
# date (orders) and the ship date (lineitem) — with role-prefixed
# attribute names. Broadcast x2: the dim is ~2.5k rows, each role join
# is a map-side hash join, no shuffle of the fact. Kept out of the
# 50-row driver window (driver=False); the local parity suite
# oracle-checks it.
# ---------------------------------------------------------------------------
@query(
    "date_dim_roleplay",
    oracle="""
    WITH dim_date AS (
      SELECT d AS date_day,
             (EXTRACT(year FROM d) * 10000 + EXTRACT(month FROM d) * 100
                + EXTRACT(day FROM d))::INT AS date_id,
             EXTRACT(year FROM d)::INT AS year,
             EXTRACT(quarter FROM d)::INT AS quarter
      FROM (SELECT unnest(generate_series(DATE '1992-01-01',
                                          DATE '1998-12-31',
                                          INTERVAL 1 DAY))::DATE AS d)
    )
    SELECT o_role.year AS order_year, o_role.quarter AS order_quarter,
           COUNT(*) AS n_items,
           COUNT(CASE WHEN s_role.year > o_role.year THEN 1 END)
             AS n_shipped_next_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN dim_date o_role ON o_role.date_day = o_orderdate
    JOIN dim_date s_role ON s_role.date_day = l_shipdate
    GROUP BY order_year, order_quarter
    """,
    driver=False,
)
def date_dim_roleplay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One dim, two roles: the same generated date dimension joined
    under order/ship aliases (the reference's role-playing CREATE VIEW
    pattern as column-renamed broadcast joins)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    days = spark.range(0, 2557).select(  # 1992-01-01 .. 1998-12-31
        F.date_add(F.lit("1992-01-01").cast("date"), F.col("id").cast("int"))
        .alias("date_day")
    )
    dim = days.select(
        "date_day",
        (
            F.year("date_day") * 10000
            + F.month("date_day") * 100
            + F.dayofmonth("date_day")
        ).cast("int").alias("date_id"),
        F.year("date_day").cast("int").alias("year"),
        F.quarter("date_day").cast("int").alias("quarter"),
    )

    def role(prefix: str) -> DataFrame:
        # the role-playing "view": same dim, role-prefixed columns
        return dim.select(
            *[F.col(c).alias(f"{prefix}_{c}") for c in dim.columns]
        )

    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(role("order")),
            F.col("o_orderdate") == F.col("order_date_day"),
        )
        .join(
            F.broadcast(role("ship")),
            F.col("l_shipdate") == F.col("ship_date_day"),
        )
    )
    return joined.groupBy(
        F.col("order_year"), F.col("order_quarter")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count(
            F.when(F.col("ship_year") > F.col("order_year"), 1)
        ).alias("n_shipped_next_year"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
