"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's named-query
registry (etl_spark/queries/*) — one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline operators; the
DuckDB oracle SQL twins live next to each query. ``entry`` runs the
flagship: the full CDC pipeline (clean -> LWW dedup -> Arrow extract ->
bucket-pruned MERGE, exactly-once, schema-evolving) over the
documents-derived change log at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["cdc_pages_final"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Capped at
    the driver's 50-row window: specs flagged driver=False (documented
    baselines superseded by registered scale paths) stay out of this
    dict but remain oracle-checked by tests/test_oracle_parity.py."""
    return {
        name: spec.fn
        for name, spec in sorted(_REGISTRY.items())
        if spec.driver
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query; queries whose semantics
    are not SQL-expressible are omitted (driver records a rows-only
    check for those)."""
    return {
        name: spec.oracle
        for name, spec in sorted(_REGISTRY.items())
        if spec.driver and spec.oracle is not None
    }
