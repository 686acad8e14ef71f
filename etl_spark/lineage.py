"""Per-epoch lineage + metrics — successor of the reference audit log
(/root/reference/etl/audit/logger.py:81-103, DDL
/root/reference/etl/init/sql/40_audit_log.sql:1-12): one row per
(epoch, stage) with row counts and wall-clock, appended to a lineage
LakeTable so every run is self-documenting (the bench harness reads
throughput straight back out of it)."""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import SparkSession

import etl_spark
from etl_spark.lake.table import LakeTable
from etl_spark.schema import LINEAGE_SCHEMA


class LineageLog:
    """Collects stage rows driver-side during an epoch, flushes as one
    append commit (the reference logs per stage and inserts one audit
    row per load, insert_audit.py:15-32)."""

    def __init__(self, table: LakeTable | None):
        self.table = table
        self.rows: list[tuple] = []

    @contextmanager
    def stage(self, epoch: int, stage: str, partition_id: int = -1):
        rec = {"rows_in": None, "rows_out": None}
        start = time.time()
        yield rec
        self.rows.append(
            (
                epoch,
                partition_id,
                stage,
                rec["rows_in"],
                rec["rows_out"],
                time.time() - start,
                etl_spark.__version__,
                None,
            )
        )

    def flush(self, spark: SparkSession) -> None:
        if self.table is None or not self.rows:
            self.rows.clear()
            return
        df = spark.createDataFrame(self.rows, LINEAGE_SCHEMA)
        import pyspark.sql.functions as F

        self.table.append(
            df.withColumn("committed_at", F.current_timestamp()),
            summary={"operation": "lineage"},
        )
        self.rows.clear()
