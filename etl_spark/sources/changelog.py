"""Deterministic synthetic WAL/binlog change-stream generators.

Successor of the reference's file gatherer + per-day loop
(/root/reference/etl/gatherer/file_downloader.py,
/root/reference/main.py:60-86): the unit of ingest is an *epoch* of
change events instead of a day of CSV. Both generators are pure
column expressions over existing rows / ``spark.range`` — fully
JVM-side, seed-free-deterministic (hash arithmetic, never ``rand()``),
so a replay at any parallelism regenerates the identical log
(SURVEY.md §7.5 non-determinism bans).

Scenario coverage (FIXTURES.md §2): interleaved I/U/D per url;
duplicate (url, warc_ts) with differing payloads (LWW must keep the
higher seq); out-of-order warc_ts within an epoch including stale
late updates (older ts arriving in a later epoch must LOSE);
Zipf-skewed hot domains; `lang` appearing at ``evolve_epoch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.sources.readers import load_table

BASE_TS = "2024-01-01 00:00:00"
# epoch-microseconds of BASE_TS (UTC) for exact-integer timestamp math
_BASE_US = 1_704_067_200 * 1_000_000

# The arithmetic core below is mirrored 1:1 by oracle SQL in
# __spark_entry__.py (cdc_* queries) — keep the two in sync.


def _escape_html(col):
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for raw, ent in (("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#39;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def render_html(title, body) -> F.Column:
    """Deterministic pseudo-HTML payload (FIXTURES.md §1). Includes a
    <script> block so the extract kernel's subtree-drop is exercised."""
    return F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><h1>"),
        title,
        F.lit("</h1><p>"),
        _escape_html(body),
        F.lit("</p><script>var t=1;</script></body></html>"),
    )


def changes_from_documents(
    spark: SparkSession,
    sf_dir: str,
    evolve_epoch: int = 2,
    with_payload: bool = True,
) -> DataFrame:
    """Correctness-scale change log derived from the `documents` table.

    Per doc: 1 + (doc_id % 3) versions; version v lands in epoch v.
    op: v=0 -> 'I'; last version of doc_id%11==0 -> 'D'; else 'U'.
    Stale-late-event case: doc_id%7==0 docs' last version carries an
    *older* warc_ts (-5 min) so LWW must keep the previous version.
    Duplicate (url, warc_ts): doc_id%5==0 docs emit a second copy of
    their last version at seq+5 with a ' dup' payload marker.
    Hot-domain skew: 60% of urls land on site0 (Zipf stand-in).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    v = F.col("v")
    nv = (d % 3 + 1).alias("n_versions")
    base = docs.select(d, F.col("text"), F.col("lang"), nv)
    versions = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_versions") - 1)).alias("v")
    )
    last = v == F.col("n_versions") - 1
    domain_id = F.when(d % 10 < 6, F.lit(0)).otherwise(d % 10)
    ts_off_min = F.when((d % 7 == 0) & last & (v > 0), F.lit(-5)).otherwise(v * 10)
    warc_ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(
        mins=(d % 1440).cast("int") + ts_off_min.cast("int")
    )
    op = (
        F.when(v == 0, F.lit("I"))
        .when(last & (d % 11 == 0), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    title = F.concat(F.lit("Doc "), d.cast("string"), F.lit(" v"), v.cast("string"))

    def event_cols(seq_expr, body_suffix: str):
        body = F.concat(F.col("text"), F.lit(body_suffix))
        cols = [
            seq_expr.cast("long").alias("seq"),
            v.cast("long").alias("epoch"),
            op.alias("op"),
            F.concat(
                F.lit("https://site"),
                domain_id.cast("string"),
                F.lit(".example/doc/"),
                d.cast("string"),
            ).alias("url"),
            warc_ts.alias("warc_ts"),
        ]
        if with_payload:
            cols.append(
                F.when(op == "D", F.lit(None).cast("binary"))
                .otherwise(F.encode(render_html(title, body), "UTF-8"))
                .alias("html")
            )
            cols.append(
                F.when(v.cast("long") >= evolve_epoch, F.col("lang"))
                .otherwise(F.lit(None).cast("string"))
                .alias("lang")
            )
        return cols

    primary = versions.select(event_cols(d * 10 + v, ""))
    dups = versions.filter((d % 5 == 0) & last).select(event_cols(d * 10 + v + 5, " dup"))
    return primary.unionByName(dups)


def epoch_provider(spark: SparkSession, sf_dir: str, evolve_epoch: int = 2):
    """Per-epoch delta with the *structural* schema evolution: the
    `lang` column does not exist in the stream before ``evolve_epoch``
    (a binlog's schema changes between epochs; a single DataFrame can't
    express that, so the provider re-shapes per epoch)."""
    full = changes_from_documents(spark, sf_dir, evolve_epoch=evolve_epoch)

    def provide(epoch: int) -> DataFrame:
        delta = full.filter(F.col("epoch") == epoch)
        if epoch < evolve_epoch:
            delta = delta.drop("lang")
        return delta

    return provide


def changes_at_scale(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    events_per_epoch: int | None = None,
    n_domains: int = 1000,
    payload_repeat: int = 30,
    id_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Bench-scale change log from ``spark.range`` — no input data, no
    Python, ``32 * payload_repeat`` bytes of html body per event (960 B
    at the default; the surrounding markup adds ~60 B); linear generate
    cost, embarrassingly parallel. Zipf-like domain skew via inverse-CDF over a hash-uniform
    u: ``domain = floor(D * u^4)`` concentrates mass near domain 0
    (hot-domain case the salting path must survive).

    ``id_range``: generate only ids [start, end) — used by the
    per-epoch provider so every range partition is productive (an
    epoch filter over the full range leaves (epochs-1)/epochs of the
    scan partitions empty, silently halving stage parallelism).
    """
    if n_keys is None:
        n_keys = max(1, n_events // 4)
    if events_per_epoch is None:
        events_per_epoch = n_events
    if id_range is None:
        r = spark.range(n_events)
    else:
        r = spark.range(id_range[0], id_range[1])
    key = (F.col("id") % n_keys).alias("key")
    u = (F.pmod(F.xxhash64(key), F.lit(1_000_000)) / 1_000_000.0)
    domain_id = F.floor(F.lit(n_domains) * F.pow(u, F.lit(4.0))).cast("int")
    url = F.concat(
        F.lit("https://d"),
        domain_id.cast("string"),
        F.lit(".example/p/"),
        key.cast("string"),
    )
    op = (
        F.when(F.col("id") < n_keys, F.lit("I"))
        .when(F.pmod(F.xxhash64(F.col("id")), F.lit(37)) == 0, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    # 1 ms per event via exact integer microseconds: at 1 s per event
    # the stream crossed clean_changes' warc_ts < 2100-01-01 sanity
    # bound at id ~ 2.4e9, silently dropping ~76% of a 10^10-event
    # bench log; ms spacing stays in-bounds to ~2.4e12 events and keeps
    # the strict id ordering LWW expects (no float rounding —
    # timestamp_micros takes a long).
    warc_ts = F.timestamp_micros(F.lit(_BASE_US) + F.col("id") * F.lit(1000))
    # Payload entropy matters: a single repeated hash compresses ~30x,
    # which (a) misrepresents web text (gzip on HTML is ~3-5x) and
    # (b) collapses AQE's compressed-size-based partition coalescing,
    # strangling post-shuffle parallelism. 8 distinct md5s (256 unique
    # bytes) repeated to size gives a realistic ~4x ratio. The trailing
    # substring keeps the knob's contract exact — 32 bytes per unit of
    # payload_repeat, not quantized to 256-byte blocks (a bare
    # repeat(block, r//8) would both shrink the default ~20% and zero
    # the knob's resolution below 8).
    unique_block = F.concat(
        *[F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{i}"))) for i in range(8)]
    )
    body = F.substring(
        F.repeat(unique_block, (payload_repeat + 7) // 8), 1, 32 * payload_repeat
    )
    title = F.concat(F.lit("Page "), key.cast("string"))
    html = (
        F.when(op == "D", F.lit(None).cast("binary"))
        .otherwise(F.encode(render_html(title, body), "UTF-8"))
    )
    return r.select(
        F.col("id").alias("seq"),
        (F.col("id") / events_per_epoch).cast("long").alias("epoch"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("lang"),
    )


def changes_at_scale_provider(
    spark: SparkSession,
    n_events: int,
    events_per_epoch: int,
    **kw,
):
    """Per-epoch generator: each epoch is its own fully-partitioned
    ``spark.range`` slice (all scan tasks productive — see id_range
    note on changes_at_scale)."""

    def provide(epoch: int) -> DataFrame:
        start = epoch * events_per_epoch
        end = min(n_events, start + events_per_epoch)
        return changes_at_scale(
            spark,
            n_events,
            events_per_epoch=events_per_epoch,
            id_range=(start, end),
            **kw,
        )

    return provide
