"""Scalar expression library — Spark twins of the reference's scalar
functions (SURVEY.md §2.8). Every function returns a Column built from
built-in expressions (whole-stage-codegen'd, no Python), matching the
reference's semantics including its null sentinels.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def smart_date_id(ts: Column) -> Column:
    """y*10000 + m*100 + d, null -> -1
    (/root/reference/etl/helper_functions.py:167-176)."""
    return F.coalesce(
        (F.year(ts) * 10000 + F.month(ts) * 100 + F.dayofmonth(ts)).cast("int"),
        F.lit(-1),
    )


def smart_time_id(ts: Column) -> Column:
    """h*10000 + mi*100 + s, null -> -1
    (/root/reference/etl/trajectory/builder.py:334-343)."""
    return F.coalesce(
        (F.hour(ts) * 10000 + F.minute(ts) * 100 + F.second(ts)).cast("int"),
        F.lit(-1),
    )


def timestamp_from_ids(date_id: Column, time_id: Column) -> Column:
    """Inverse of the smart keys (/root/reference/etl/init/
    single_statement_sql/01_smart_date_time_id.sql:1-11). The smart
    keys map null -> -1, so the inverse must map -1 back to null — and
    under ANSI mode (Spark 4 default) an unguarded to_timestamp on the
    '-1'-bearing string would abort the job, not return null."""
    return F.when(
        (date_id == F.lit(-1)) | (time_id == F.lit(-1)),
        F.lit(None).cast("timestamp"),
    ).otherwise(
        F.to_timestamp(
            F.concat(
                F.lpad(date_id.cast("string"), 8, "0"),
                F.lpad(time_id.cast("string"), 6, "0"),
            ),
            "yyyyMMddHHmmss",
        )
    )


def dpmod(a: Column, b: Column) -> Column:
    """Floor-based float modulo (/root/reference/etl/init/
    single_statement_sql/dpmod.sql:1-5). Spark's pmod is already
    positive-result for positive modulus."""
    return F.pmod(a, b)


def delta_upperbounded(arr: Column, upper_bound: float) -> Column:
    """Sum of circular consecutive differences:
    sum over i of min(d_i, ub - d_i) where
    d_i = pmod(a[i+1] - a[i], ub); empty / 1-element -> 0.0.
    Twin of /root/reference/etl/init/single_statement_sql/
    calculate_delta_upperbounded.sql:1-28, re-expressed with
    higher-order array functions (zip_with + aggregate) — stays
    JVM-side, no UDF."""
    ub = F.lit(float(upper_bound))
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.least(F.pmod(b - a, ub), ub - F.pmod(b - a, ub)),
    )
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)
    )


def delta_plain(arr: Column, use_abs: bool = True) -> Column:
    """Non-circular consecutive-difference sum (twin of
    calculate_delta.sql:1-20)."""
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.abs(b - a) if use_abs else (b - a),
    )
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)
    )


def argmin_key(m: Column) -> Column:
    """Key of the smallest value in a map — twin of
    get_lowest_json_key.sql:1-6 (W7): sort (value, key) structs, take
    the first key."""
    entries = F.transform(
        F.map_entries(m), lambda e: F.struct(e["value"].alias("v"), e["key"].alias("k"))
    )
    # F.get, not [0]: an empty map must yield null — under ANSI mode
    # (Spark 4 default) [0] on an empty array raises INVALID_ARRAY_INDEX
    # and kills the whole job on the first empty-map row.
    return F.get(F.array_sort(entries), 0)["k"]


def euclidean(dx: Column, dy: Column) -> Column:
    """(/root/reference/etl/trajectory/builder.py:527-539)."""
    return F.sqrt(F.pow(dx, F.lit(2)) + F.pow(dy, F.lit(2)))


KNOTS_PER_MPS = 1.943844  # builder.py:25-38 (python path constant)


def speed_knots(dist_m: Column, dt_sec: Column) -> Column:
    """dist/dt * 1.943844 with the reference's GREATEST(dt,1) zero
    guard (fact_cell_rollup.sql:19 uses 1.94 — per-path constants kept
    distinct exactly as the reference does, SURVEY.md C12)."""
    return dist_m / F.greatest(dt_sec, F.lit(1)) * F.lit(KNOTS_PER_MPS)
