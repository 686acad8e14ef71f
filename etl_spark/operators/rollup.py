"""Post-merge rollups — successor of the reference's rollup layer
(/root/reference/etl/rollup/apply_rollups.py,
fact_cell_rollup.sql, heatmaps/01-05): derived aggregate tables
maintained idempotently after each load.

Design: **bucket-partial rollup**. The reference aggregates per fine
cell then re-aggregates to the 5 km parent
(/root/reference/etl/rollup/sql/heatmaps/01_count.sql:50-52) — the
partial/final split. Here the partial key is the pages *bucket*: each
epoch recomputes partial aggregates only for the buckets its merge
rewrote, and the final (domain, day) numbers are a cheap re-aggregation
of partials at read time. Epoch cost is therefore proportional to
touched data, never to table size — the property that survives 10^10
events. Rollup state is itself bounded (buckets x domains x days), so
its replace-commit is metadata-cheap; at truly unbounded domain
cardinality the same partials would be MERGEd per bucket instead of
replaced wholesale.

Purity: partials are a pure function of the pages snapshot (SURVEY.md
K5 note: "compute-before-write (preferred: make rollups pure)") —
replaying an epoch regenerates identical partials, so the rollup is
exactly-once by construction, with the applied-epoch guard on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.keys import smart_date_id
from etl_spark.lake.table import BUCKET_COL, LakeTable
from etl_spark.operators.clean import domain_of

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("src_bucket", T.IntegerType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("day_id", T.IntegerType(), True),
        T.StructField("n_pages", T.LongType(), True),
        T.StructField("text_chars", T.LongType(), True),
        T.StructField("max_warc_ts", T.TimestampType(), True),
    ]
)


def compute_partials(pages_df: DataFrame) -> DataFrame:
    """Partial aggregates keyed (src_bucket, domain, day_id)."""
    return (
        pages_df.select(
            F.col(BUCKET_COL).alias("src_bucket"),
            domain_of(F.col("url")).alias("domain"),
            smart_date_id(F.col("warc_ts")).alias("day_id"),
            F.length(F.col("text")).alias("_chars"),
            F.col("warc_ts"),
        )
        .groupBy("src_bucket", "domain", "day_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("_chars").alias("text_chars"),
            F.max("warc_ts").alias("max_warc_ts"),
        )
    )


def rollup_domain_stats(
    spark: SparkSession,
    pages: LakeTable,
    rollup: LakeTable,
    epoch: int,
    touched_buckets: list[int] | None = None,
) -> None:
    """Refresh partials for the buckets the epoch touched."""
    if epoch in rollup.applied_epochs():
        return
    if touched_buckets is None:
        touched_buckets = pages.snapshot().summary.get("touched_list")
    if touched_buckets is None:
        # fall back to full refresh (still pure + idempotent)
        fresh = compute_partials(pages.read(spark, with_bucket=True))
        keep = None
    else:
        if not touched_buckets:
            rollup.commit(None, applied_epoch=epoch, summary={"operation": "rollup", "epoch": epoch})
            return
        fresh = compute_partials(
            pages.read(spark, buckets=touched_buckets, with_bucket=True)
        )
        keep = rollup.read(spark).filter(
            ~F.col("src_bucket").isin([int(b) for b in touched_buckets])
        )
    new_state = fresh if keep is None else keep.unionByName(fresh)
    from etl_spark.lake.table import bucket_expr

    snap = rollup.snapshot()
    rollup.commit(
        new_state.withColumn(BUCKET_COL, bucket_expr(snap.key_cols, snap.n_buckets)),
        overwrite_all=True,
        applied_epoch=epoch,
        summary={"operation": "rollup", "epoch": epoch},
    )


def read_rollup(spark: SparkSession, rollup: LakeTable) -> DataFrame:
    """Final aggregation over partials (the read-side of the two-level
    split; same shape as the reference's 5 km re-aggregation)."""
    return (
        rollup.read(spark)
        .groupBy("domain", "day_id")
        .agg(
            F.sum("n_pages").alias("n_pages"),
            F.sum("text_chars").alias("text_chars"),
            F.max("max_warc_ts").alias("max_warc_ts"),
        )
    )
