"""Sequence-payload queries — §2.9 G3/G4 (ordered assembly per key) and
G5/G7 (bounded segmentation), the two archetypes behind any
sequence-column pipeline (trajectories in the reference, token streams
here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators.segment import segment_documents
from etl_spark.queries import query
from etl_spark.sources.readers import load_table

MAX_CHUNK_WORDS = 64


# ---------------------------------------------------------------------------
# G3/G4: assemble the ordered per-key sequence into array columns — the
# reference's trajectory assembly (/root/reference/etl/trajectory/
# builder.py:428-443: per-MMSI points sorted by time -> one sequence
# row). One shuffle on the key; collect_list gets map-side partials and
# array_sort orders inside the executor, so there is no per-key window
# sort. Output is all-scalar: the assembled array is verified through
# md5 fingerprints of the ordered (ts, event_id) sequence and of the
# value payload, plus the first/last endpoints — plain string/int
# columns a pandas-based harness can lexsort (raw array columns
# cannot be).
# ---------------------------------------------------------------------------
@query(
    "sequence_assembly",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_points,
           (array_agg(event_id ORDER BY ts, event_id))[1] AS first_event_id,
           (array_agg(event_id ORDER BY ts, event_id))[-1] AS last_event_id,
           md5(string_agg((epoch_us(ts) // 1000000)::BIGINT || ':' || event_id,
                          ',' ORDER BY ts, event_id)) AS seq_md5,
           md5(string_agg(CAST(floor(CAST(value AS DOUBLE) * 10000) AS BIGINT)::VARCHAR,
                          ',' ORDER BY ts, event_id)) AS seq_vals_md5
    FROM events GROUP BY user_id
    """,
)
def sequence_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list(struct(ts, event_id, value)) -> array_sort: the
    per-key ordered-sequence column. At 10^10 events this is the one
    legitimate 'big array per key' operator — bounded by per-key
    cardinality, never by table size, and skew shows up per key where
    salting can't help (a sequence must end up whole); the mitigation is
    the G5/G7 segmenter below.

    The assembled arrays are verified through scalar fingerprints
    (driver-canonicalizable — a raw array column cannot be lexsorted by
    the harness): ``seq_md5`` pins exact order + content of the
    (ts, event_id) sequence; ``seq_vals_md5`` pins the value payload via
    ``floor(value*10000)`` — pure integer arithmetic, bit-identical
    across engines (no float-to-string formatting in the hash input);
    first/last elements prove the ordering endpoints directly."""
    ev = load_table(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col("value").alias("value")))
    )
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_points"), seq.alias("seq"))
        .select(
            "user_id",
            "n_points",
            F.element_at("seq", 1)["event_id"].alias("first_event_id"),
            F.element_at("seq", -1)["event_id"].alias("last_event_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        "seq",
                        lambda x: F.concat_ws(
                            ":",
                            F.unix_timestamp(x["ts"]).cast("string"),
                            x["event_id"].cast("string"),
                        ),
                    ),
                )
            ).alias("seq_md5"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        "seq",
                        lambda x: F.floor(x["value"].cast("double") * 10000).cast(
                            "string"
                        ),
                    ),
                )
            ).alias("seq_vals_md5"),
        )
    )


# ---------------------------------------------------------------------------
# G5/G7: bounded segmentation of a sequence payload, as a pandas-UDF
# kernel (operators/segment.py) with an exact SQL twin — the reference's
# trajectory split (staging_split_trajectories.sql:24) /
# simplify (simplify_trajectories.sql:2) slot, recast as context-window
# chunk packing over documents.
# ---------------------------------------------------------------------------
@query(
    "segment_split",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           i::INT AS chunk_idx,
           array_to_string(words[(i * {MAX_CHUNK_WORDS} + 1):((i + 1) * {MAX_CHUNK_WORDS})], ' ') AS chunk_text,
           len(words[(i * {MAX_CHUNK_WORDS} + 1):((i + 1) * {MAX_CHUNK_WORDS})]) AS n_words
    FROM w, unnest(range(0, (len(words) + {MAX_CHUNK_WORDS} - 1) // {MAX_CHUNK_WORDS})) AS t(i)
    """,
)
def segment_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 1->N chunking: each document's word sequence split
    into <=64-word chunks. Shuffle-free (per-partition fan-out); the
    oracle re-derives the identical chunks with list slicing."""
    d = load_table(spark, sf_dir, "documents")
    return segment_documents(d, max_words=MAX_CHUNK_WORDS)
