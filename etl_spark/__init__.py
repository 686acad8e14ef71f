"""etl_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the capabilities of DIPAAL/etl
(reference: /root/reference — an AIS batch clean-and-load pipeline into
a Citus/PostGIS warehouse) as an idiomatic Spark engine:

* binlog/WAL-shaped change stream -> staged clean -> LWW dedup ->
  vectorized extract -> key-partitioned MERGE upsert into a
  snapshot-versioned Parquet lake table (exactly-once, resumable,
  schema-evolving), mirroring the reference's staged architecture
  (staging clean -> conformed dimensional load -> rollup,
  /root/reference/main.py:98-147) as micro-batches;
* the full operator inventory of SURVEY.md section 2 re-expressed with
  DataFrame/SQL/Catalyst primitives (no per-row Python anywhere on the
  hot path — Arrow-vectorized pandas UDFs only where built-ins cannot
  express the semantics);
* training-data-pipeline operators (dedup families, ANN similarity,
  text analysis, multimodal plumbing) as first-class components.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.2.0"
