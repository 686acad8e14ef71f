"""Typed readers for the driver-provided parquet test tables.

Successor of the reference's pinned-dtype CSV scan
(/root/reference/etl/cleaning/clean_data.py:79-120): every read carries
an explicit schema — no inference, stable plans, column pruning intact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_spark import schema as S

_SCHEMAS = {
    "events": S.EVENTS_SCHEMA,
    "documents": S.DOCUMENTS_SCHEMA,
    "embeddings": S.EMBEDDINGS_SCHEMA,
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. TPC-H tables read with their embedded
    parquet schema (written by the driver, already typed); the three
    engine-critical tables are pinned."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    if name in _SCHEMAS:
        reader = reader.schema(_SCHEMAS[name])
    return reader.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names=S.TESTDATA_TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
