"""Snapshot-versioned Parquet lake table with atomic commits.

The north rule requires an exactly-once, schema-evolving, rollback-able
lake sink (the role Iceberg plays on a production cluster — its runtime
jar is not in this image, so the table format is implemented here from
first principles; the public Iceberg *spec* concepts — snapshot
manifests, atomic pointer swap, hidden bucket partitioning, additive
schema evolution, snapshot rollback — are re-derived on plain Parquet).

It replaces, Spark-natively, the reference's warehouse mechanics:

* monthly ``PARTITION BY RANGE`` + on-demand partition DDL
  (/root/reference/etl/insert/ensure_partitions.py:28-58)  ->  hidden
  hash-bucket layout on the merge key (``pmod(xxhash64(key), B)``);
* ``INSERT ... ON CONFLICT DO NOTHING`` idempotency
  (/root/reference/etl/rollup/sql/fact_cell_rollup.sql:138)  ->
  snapshot ``applied_epochs`` bookkeeping: re-committing an epoch is a
  no-op, so replay converges (exactly-once);
* one transaction per load day (/root/reference/main.py:147
  ``conn.commit()``)  ->  one atomic HEAD pointer swap per commit;
* rollback-by-date (/root/reference/etl/init/single_statement_sql/
  98_rollback.sql:1-27)  ->  ``rollback(version)`` pointer move.

Layout::

    <root>/
      data/v<version>/_pb=<bucket>/part-*.parquet
      _snapshots/v<version>.json      # immutable manifest
      _HEAD                           # atomic pointer: current version

Scale design (100 TB, 1000 executors)
-------------------------------------
* Data is bucketed by ``pmod(xxhash64(key), n_buckets)``; a MERGE only
  reads + rewrites the buckets containing changed keys
  (copy-on-write at bucket granularity — the manifest carries forward
  untouched buckets' file references, so per-epoch write cost is
  proportional to touched data, not table size).
* The ``_bucket`` column is stored physically in every file, so a
  bucket-pruned read is an explicit file-list scan — no directory
  listing of the whole table, no partition discovery job.
* Manifests are O(n_buckets x files-per-bucket) JSON — thousands of
  entries, driver-side trivial (same shape as an Iceberg manifest list).
* Files are clustered on the event-time column at write
  (sortWithinPartitions) and the manifest records per-file [min, max]
  event-time bounds, so a time-range read prunes to a slice of each
  bucket instead of scanning it whole — the successor of the
  reference's SP-GiST/stbox window indexes
  (/root/reference/etl/init/sql/31_fact_cell.sql:35).
* Commits are optimistic-concurrency guarded (the Iceberg commit
  protocol shape): version ids are claimed atomically (O_EXCL claim
  marker, never reused), the HEAD swap runs under a short O_EXCL lock
  with a parent check, and a loser either rebases its metadata onto
  the new head (appends, disjoint-bucket merges) or raises
  :class:`CommitConflictError` loudly (overlapping bucket rewrites) —
  never a silently dropped snapshot. The atomic rename gives readers
  snapshot isolation either way.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "_bucket"
# Tombstone control column (see etl_spark/schema.py PAGES_SCHEMA): rows
# with _deleted=true are retained delete markers, hidden from default
# reads, arbitrated like live rows by MERGE, GC'd by expire_tombstones.
DELETED_COL = "_deleted"
_PARTITION_DIR_COL = "_pb"  # directory-layout twin of BUCKET_COL


class CommitConflictError(RuntimeError):
    """Two writers raced a commit and the loser's changes could not be
    rebased safely (overlapping bucket rewrite, or a stale/stuck commit
    lock). The losing commit is NOT applied; retry after inspecting."""


def bucket_expr(key_cols: list[str], n_buckets: int):
    """Deterministic bucket id: pmod(xxhash64(keys), B).

    xxhash64 (not random ids) per the reference's own lesson: its random
    trajectory_sub_id generator needs a collision-retry loop
    (/root/reference/etl/insert/insert_trajectories.py:30-50); a
    deterministic hash is replay-stable for free.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_json: str
    key_cols: list[str]
    n_buckets: int
    files: dict[str, list[str]]  # bucket id (as str) -> relative parquet paths
    applied_epochs: list[int]
    summary: dict
    committed_at: float
    # Manifest-level tombstone statistics (Iceberg delete-file stats
    # analog): {"col": <event-time col>, "buckets": {bucket: [count,
    # min-event-time-iso-or-null]}}. A bucket PRESENT in "buckets" has
    # known tombstone state ([0, null] = clean, prunable); a bucket
    # with files but no entry is UNKNOWN and must be scanned. Lets
    # expire_tombstones prune its discovery scan to buckets whose
    # min is past the horizon instead of reading the whole table.
    tombstone_stats: dict = field(default_factory=dict)
    # Per-file event-time bounds (Iceberg per-file column metrics
    # analog, the successor of the reference's SP-GiST/stbox indexes,
    # /root/reference/etl/init/sql/31_fact_cell.sql:35):
    # {"col": <event-time col>, "files": {rel_path: [min-iso-or-null,
    # max-iso-or-null]}}. Written files are clustered on the event-time
    # column (sortWithinPartitions at commit), so the bounds are tight;
    # ``read(time_range=...)`` skips files whose bounds fall outside
    # the window. [null, null] = the file holds ONLY null-event-time
    # rows (prunable by ANY range predicate, which excludes nulls); a
    # file with no entry is UNKNOWN and always read.
    file_stats: dict = field(default_factory=dict)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "parent": self.parent,
                "schema_json": self.schema_json,
                "key_cols": self.key_cols,
                "n_buckets": self.n_buckets,
                "files": self.files,
                "applied_epochs": self.applied_epochs,
                "summary": self.summary,
                "committed_at": self.committed_at,
                "tombstone_stats": self.tombstone_stats,
                "file_stats": self.file_stats,
            },
            indent=1,
        )

    @staticmethod
    def from_json(raw: str) -> "Snapshot":
        d = json.loads(raw)
        return Snapshot(**d)


class LakeTable:
    """A snapshot-versioned, bucket-partitioned Parquet table."""

    def __init__(self, root: str):
        self.root = root

    # -- paths ------------------------------------------------------------
    @property
    def _head_path(self) -> str:
        return os.path.join(self.root, "_HEAD")

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.root, "_snapshots", f"v{version:06d}.json")

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.root, "data", f"v{version:06d}")

    # -- lifecycle ---------------------------------------------------------
    @staticmethod
    def create(
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "LakeTable":
        """Create an empty table (v0). Successor of the reference's DDL
        bootstrap (/root/reference/etl/init/sqlrunner.py:44-57)."""
        os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        table = LakeTable(root)
        if os.path.exists(table._head_path):
            raise FileExistsError(f"table already exists at {root}")
        snap = Snapshot(
            version=0,
            parent=None,
            schema_json=json.dumps(schema.jsonValue()),
            key_cols=list(key_cols),
            n_buckets=n_buckets,
            files={},
            applied_epochs=[],
            summary={"operation": "create"},
            committed_at=time.time(),
        )
        table._write_snapshot(snap)
        table._swap_head(0)
        return table

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_HEAD"))

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    # -- snapshot bookkeeping ------------------------------------------------
    def head_version(self) -> int:
        with open(self._head_path) as fh:
            return int(fh.read().strip())

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is None:
            version = self.head_version()
        with open(self._snap_path(version)) as fh:
            return Snapshot.from_json(fh.read())

    def versions(self) -> list[int]:
        snap_dir = os.path.join(self.root, "_snapshots")
        return sorted(int(f[1:-5]) for f in os.listdir(snap_dir) if f.endswith(".json"))

    def _write_snapshot(self, snap: Snapshot) -> None:
        path = self._snap_path(snap.version)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(snap.to_json())
        os.rename(tmp, path)

    def _swap_head(self, version: int) -> None:
        """Atomic commit: POSIX rename is the transaction boundary —
        the analog of the reference's per-day ``conn.commit()``
        (/root/reference/main.py:147)."""
        tmp = self._head_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.rename(tmp, self._head_path)

    def rollback(self, version: int) -> None:
        """Point HEAD at an older snapshot (successor of
        98_rollback.sql's delete-by-date-id undo)."""
        if not os.path.exists(self._snap_path(version)):
            raise FileNotFoundError(f"no snapshot v{version}")
        self._swap_head(version)

    def applied_epochs(self) -> set[int]:
        return set(self.snapshot().applied_epochs)

    def _claim_version(self) -> int:
        """Atomically allocate a version id ABOVE every existing
        snapshot AND every outstanding claim, not head+1.

        Two rules, both Iceberg's: (1) after ``rollback(v)`` the next
        commit starts a new branch, and head+1 would reuse — and
        overwrite, manifest and data directory both — the rolled-back
        branch's numbers, destroying files that later snapshots still
        reference; (2) two concurrent writers must never allocate the
        same id, so the claim is an O_EXCL marker file — the loser's
        O_EXCL fails and it moves to the next id. A crashed writer's
        leftover claim permanently skips that number, which is exactly
        the never-reuse rule. Claims cost one inode each; they are
        removed with their snapshot by expire_snapshots."""
        snap_dir = os.path.join(self.root, "_snapshots")
        v = (
            max(
                int(f[1:].split(".", 1)[0])
                for f in os.listdir(snap_dir)
                if f.endswith((".json", ".claim"))
            )
            + 1
        )
        while True:
            try:
                fd = os.open(
                    self._snap_path(v) + ".claim",
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return v
            except FileExistsError:
                v += 1

    @contextmanager
    def _commit_lock(self, timeout: float = 10.0):
        """Serialize the (head-check, snapshot-write, head-swap)
        critical section across writers on one warehouse. The section
        is two tiny file writes, so the lock is held for milliseconds;
        a lock outliving ``timeout`` means a writer died inside it —
        fail loudly with the path so an operator can clear it."""
        path = os.path.join(self.root, "_COMMIT_LOCK")
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.time() >= deadline:
                    raise CommitConflictError(
                        f"commit lock {path} held for >{timeout}s; a writer "
                        "likely died mid-commit — remove the lock file after "
                        "verifying no commit is in flight"
                    )
                time.sleep(0.005)
        try:
            os.close(fd)
            yield
        finally:
            os.unlink(path)

    def _scan_write_stats(
        self,
        spark: SparkSession,
        written: dict[str, list[str]],
        event_time_col: str,
        schema: T.StructType,
    ) -> tuple[dict[str, list] | None, dict[str, list] | None]:
        """ONE column-pruned scan over the just-written files producing
        both manifest stat families:

        * per-bucket ``[tombstone count, min tombstone event time]``
          (lets expire_tombstones prune its discovery scan) — None when
          the table carries no tombstone column;
        * per-file ``[min event time, max event time]`` (lets
          ``read(time_range=...)`` skip files) — None when the event
          column is missing or non-temporal.

        Sized by the epoch's write, not the table; the driver result is
        bounded by the number of files written (per-file grouping via
        ``input_file_name()``, mapped back to manifest-relative paths
        driver-side)."""
        rel_paths = [p for plist in written.values() for p in plist]
        et_field = next(
            (f for f in schema.fields if f.name == event_time_col), None
        )
        if (
            et_field is None
            or not isinstance(et_field.dataType, (T.TimestampType, T.DateType))
            or not rel_paths
        ):
            return None, None
        has_tomb = any(f.name == DELETED_COL for f in schema.fields)
        fields = [T.StructField(event_time_col, et_field.dataType, True)]
        if has_tomb:
            fields.append(T.StructField(DELETED_COL, T.BooleanType(), True))
        df = spark.read.schema(T.StructType(fields)).parquet(
            *[os.path.join(self.root, p) for p in rel_paths]
        )
        dead = (
            F.coalesce(F.col(DELETED_COL), F.lit(False))
            if has_tomb
            else F.lit(False)
        )
        rows = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min(event_time_col).alias("mn"),
                F.max(event_time_col).alias("mx"),
                F.sum(dead.cast("long")).alias("n_dead"),
                F.min(F.when(dead, F.col(event_time_col))).alias("dead_mn"),
            )
            .collect()
        )
        by_rel = {}
        for r in rows:
            path = urllib.parse.unquote(urllib.parse.urlparse(r["f"]).path)
            by_rel[os.path.relpath(path, self.root)] = r
        file_stats = {
            rel: [
                r["mn"].isoformat() if r["mn"] is not None else None,
                r["mx"].isoformat() if r["mx"] is not None else None,
            ]
            for rel, r in by_rel.items()
        }
        if not has_tomb:
            return None, file_stats
        bucket_stats: dict[str, list] = {}
        for bucket, paths in written.items():
            n, mn = 0, None
            # A path the URI->relpath mapping failed to recover (e.g. a
            # root reached through a symlink) must leave this bucket
            # UNKNOWN — recording [0, None] would claim "known clean"
            # and permanently exclude the bucket from tombstone-GC
            # discovery. (Empty data files never exist: partitionBy
            # writes no file for an empty partition.)
            if any(p not in by_rel for p in paths):
                continue
            for p in paths:
                r = by_rel[p]
                n += int(r["n_dead"] or 0)
                dm = r["dead_mn"]
                if dm is not None and (mn is None or dm < mn):
                    mn = dm
            bucket_stats[bucket] = [n, mn.isoformat() if mn is not None else None]
        return bucket_stats, file_stats

    @staticmethod
    def _merge_tombstone_stats(
        head: Snapshot,
        written: dict[str, list[str]],
        touched_buckets: Iterable[int] | None,
        overwrite_all: bool,
        written_stats: dict[str, list] | None,
        event_time_col: str | None,
    ) -> dict:
        """Next snapshot's tombstone_stats: carry forward untouched
        buckets, drop replaced buckets (unknown unless recomputed),
        overlay the just-written buckets' fresh stats."""
        head_stats = head.tombstone_stats or {}
        # a caller naming the event-time column adopts it even when the
        # write produced no files (e.g. GC emptied the last marker)
        col = event_time_col or head_stats.get("col")
        if not col:
            return {}
        buckets: dict = {}
        if not overwrite_all and head_stats.get("col") == col:
            buckets.update(head_stats.get("buckets", {}))
        for b in touched_buckets or []:
            buckets.pop(str(b), None)
        if written_stats is not None:
            buckets.update(written_stats)
        else:
            # rewritten without a stats pass -> state unknown, must scan
            for b in written:
                buckets.pop(b, None)
        return {"col": col, "buckets": buckets}

    @staticmethod
    def _merge_file_stats(
        head: Snapshot,
        files: dict[str, list[str]],
        written_file_stats: dict[str, list] | None,
        event_time_col: str | None,
    ) -> dict:
        """Next snapshot's per-file event-time bounds: carry forward
        entries whose files survive, overlay the just-written files'
        fresh bounds, drop entries for removed files. Entries recorded
        under a DIFFERENT event column don't carry (bounds of another
        column are meaningless for pruning this one)."""
        head_stats = head.file_stats or {}
        col = event_time_col or head_stats.get("col")
        if not col:
            return {}
        live = {p for plist in files.values() for p in plist}
        out: dict[str, list] = {}
        if head_stats.get("col") == col:
            out = {
                p: st
                for p, st in head_stats.get("files", {}).items()
                if p in live
            }
        if written_file_stats:
            out.update(
                {p: st for p, st in written_file_stats.items() if p in live}
            )
        return {"col": col, "files": out}

    def _publish(self, snap: Snapshot) -> bool:
        """Attempt the atomic publish: holds the commit lock, verifies
        HEAD still equals ``snap.parent``, then writes the manifest and
        swaps HEAD. Returns False (without publishing) if another
        writer moved HEAD first — the caller rebases and retries."""
        with self._commit_lock():
            if self.head_version() != snap.parent:
                return False
            self._write_snapshot(snap)
            self._swap_head(snap.version)
            return True

    # -- read ---------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        buckets: Iterable[int] | None = None,
        version: int | None = None,
        with_bucket: bool = False,
        include_deleted: bool = False,
        time_range: tuple | None = None,
    ) -> DataFrame:
        """Snapshot read; optional bucket pruning via explicit file list.

        Old files missing later-added columns read as null (additive
        schema evolution — the explicit read schema fills the gap,
        no mergeSchema full-footer scan needed).

        Tables carrying the tombstone column hide delete markers by
        default; ``include_deleted`` exposes them (the MERGE current-side
        read and maintenance need the markers to arbitrate/GC). The
        filter is a pure Catalyst predicate, so it pushes into the
        parquet scan.

        ``time_range=(lo, hi)`` (datetimes or ISO strings, either side
        None for open-ended) additionally skips files whose manifest
        event-time bounds fall outside [lo, hi] — the manifest-level
        twin of parquet row-group min/max pruning, and the successor of
        the reference's stbox/SP-GiST window indexes (cell_query.sql's
        bread-and-butter read). Pruning only SKIPS whole files: the
        caller still applies the actual ``event_time_col BETWEEN``
        predicate (which a range semantically implies — a range
        predicate excludes null event times, matching the pruning of
        all-null files).
        """
        snap = self.snapshot(version)
        schema = snap.schema
        read_schema = T.StructType(
            schema.fields + [T.StructField(BUCKET_COL, T.IntegerType(), False)]
        )
        if buckets is None:
            paths = [p for plist in snap.files.values() for p in plist]
        else:
            paths = [p for b in buckets for p in snap.files.get(str(b), [])]
        if time_range is not None:
            paths = self._prune_paths_by_time(snap, paths, time_range)
        if not paths:
            df = spark.createDataFrame([], read_schema)
        else:
            df = spark.read.schema(read_schema).parquet(
                *[os.path.join(self.root, p) for p in paths]
            )
        has_tomb = any(f.name == DELETED_COL for f in schema.fields)
        if has_tomb and not include_deleted:
            # IsNull-OR-EqualTo (not ~coalesce) so the predicate stays
            # parquet-pushable: tombstone-heavy row groups skip on stats.
            df = df.filter(
                F.col(DELETED_COL).isNull() | (F.col(DELETED_COL) == F.lit(False))
            ).drop(DELETED_COL)
        if not with_bucket:
            df = df.drop(BUCKET_COL)
        return df

    @staticmethod
    def _prune_paths_by_time(
        snap: Snapshot, paths: list[str], time_range: tuple
    ) -> list[str]:
        """Drop files whose recorded [min, max] event-time bounds prove
        no row can satisfy ``lo <= t <= hi``. Files with no recorded
        bounds are kept (unknown is never pruned); [null, null] files
        hold only null event times and are pruned (a range predicate
        excludes nulls)."""
        import datetime as dt

        stats = snap.file_stats or {}
        entries = stats.get("files")
        if not entries:
            return paths

        def _parse(x):
            if x is None or isinstance(x, dt.datetime):
                return x
            return dt.datetime.fromisoformat(str(x))

        try:
            lo, hi = (_parse(x) for x in time_range)
        except (TypeError, ValueError):
            return paths  # unusable range: correctness over pruning
        if (lo is not None and lo.tzinfo is not None) or (
            hi is not None and hi.tzinfo is not None
        ):
            # recorded bounds are session-naive; don't guess a tz mapping
            return paths
        out = []
        for p in paths:
            ent = entries.get(p)
            if ent is None:
                out.append(p)  # unknown bounds: must read
                continue
            mn, mx = ent
            if mn is None and mx is None:
                continue  # only null event times: no range can match
            mn = dt.datetime.fromisoformat(mn) if mn is not None else None
            mx = dt.datetime.fromisoformat(mx) if mx is not None else None
            if lo is not None and mx is not None and mx < lo:
                continue
            if hi is not None and mn is not None and mn > hi:
                continue
            out.append(p)
        return out

    def row_count(self, spark: SparkSession) -> int:
        return self.read(spark).count()

    # -- write --------------------------------------------------------------
    def _write_data(
        self,
        df: DataFrame,
        version: int,
        already_partitioned: bool = False,
        sort_col: str | None = None,
        max_records_per_file: int | None = None,
    ) -> dict[str, list[str]]:
        """Write ``df`` (must carry BUCKET_COL) under data/v<version>,
        one directory per bucket; returns bucket -> relative file paths.

        ``repartition(BUCKET_COL)`` + ``partitionBy`` keeps one shuffle
        and writes each bucket's rows contiguously (at 100 TB this is
        the same write shape Iceberg's fanout writer produces). The
        bucket column is stored both physically (for file-list reads)
        and as the partition dir (for humans / external tools).
        ``already_partitioned``: the producer guarantees each bucket's
        rows live in one task partition (e.g. the grouped-map SPJ
        merge) — skip the extra shuffle.

        ``sort_col``: cluster each bucket's rows on this column before
        writing (``sortWithinPartitions`` — per-task sort, no shuffle;
        SURVEY §4.2 item 4's "(domain, warc_ts) clustering"). Paired
        with ``max_records_per_file`` (Iceberg's target-file-size
        analog) a big bucket splits into consecutive event-time chunks,
        so the manifest's per-file bounds prune time-range reads to a
        slice of the bucket — and row groups inside each file carry
        tight parquet min/max for predicate pushdown either way.
        """
        out_dir = self._data_dir(version)
        with_dir = df.withColumn(_PARTITION_DIR_COL, F.col(BUCKET_COL))
        if not already_partitioned:
            with_dir = with_dir.repartition(F.col(BUCKET_COL))
        if sort_col is not None and sort_col in df.columns:
            with_dir = with_dir.sortWithinPartitions(
                _PARTITION_DIR_COL, sort_col
            )
        writer = with_dir.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        writer.partitionBy(_PARTITION_DIR_COL).parquet(out_dir)
        files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{_PARTITION_DIR_COL}="):
                continue
            bucket = entry.split("=", 1)[1]
            rel_dir = os.path.relpath(os.path.join(out_dir, entry), self.root)
            files[bucket] = sorted(
                os.path.join(rel_dir, f)
                for f in os.listdir(os.path.join(out_dir, entry))
                if f.endswith(".parquet")
            )
        return files

    def commit(
        self,
        new_data: DataFrame | None,
        *,
        touched_buckets: Iterable[int] | None = None,
        schema: T.StructType | None = None,
        applied_epoch: int | None = None,
        summary: dict | None = None,
        overwrite_all: bool = False,
        already_bucket_partitioned: bool = False,
        n_buckets: int | None = None,
        event_time_col: str | None = None,
        max_records_per_file: int | None = None,
    ) -> Snapshot:
        """Write ``new_data`` (with BUCKET_COL) and commit a snapshot.

        ``touched_buckets``: buckets whose files are replaced by the new
        data; untouched buckets carry forward (bucket-granular
        copy-on-write). ``overwrite_all`` replaces every bucket.
        Metadata-only commits (schema evolution) pass ``new_data=None``.
        ``event_time_col``: when given, written files are CLUSTERED on
        that column (per-bucket sortWithinPartitions) and the manifest
        records their per-file [min, max] bounds — what makes
        ``read(time_range=...)`` prune — plus, if the table carries the
        tombstone column, per-bucket tombstone stats so
        expire_tombstones can prune its discovery scan; without it the
        written files carry no bounds and the written buckets'
        tombstone state is marked unknown. ``max_records_per_file``
        splits a big bucket into several time-consecutive files
        (tighter pruning; Iceberg's target-file-size knob).
        """
        head = self.snapshot()
        if applied_epoch is not None and applied_epoch in head.applied_epochs:
            return head  # exactly-once: epoch already applied
        # The spec the caller bucketed ``new_data`` against; a rebase
        # onto a head with a DIFFERENT spec is never safe (see below).
        base_n_buckets = head.n_buckets
        base_key_cols = list(head.key_cols)
        version = self._claim_version()
        if new_data is not None:
            written = self._write_data(
                new_data,
                version,
                already_partitioned=already_bucket_partitioned,
                sort_col=event_time_col,
                max_records_per_file=max_records_per_file,
            )
        else:
            written = {}
        written_stats, written_file_stats = None, None
        if new_data is not None and event_time_col is not None and written:
            written_stats, written_file_stats = self._scan_write_stats(
                new_data.sparkSession,
                written,
                event_time_col,
                schema or head.schema,
            )
        # Optimistic-concurrency publish loop (the Iceberg commit
        # protocol shape): data files are written once above; the
        # metadata (files dict, epochs, parent) is rebuilt against the
        # current head on every attempt, so a lost race rebases instead
        # of silently clobbering the winner's snapshot.
        while True:
            if overwrite_all:
                files = written
            else:
                files = dict(head.files)
                for b in touched_buckets or []:
                    files.pop(str(b), None)
                files.update(written)
            epochs = list(head.applied_epochs)
            if applied_epoch is not None:
                epochs.append(applied_epoch)
            snap = Snapshot(
                version=version,
                parent=head.version,
                schema_json=json.dumps((schema or head.schema).jsonValue()),
                key_cols=head.key_cols,
                n_buckets=n_buckets or head.n_buckets,
                files=files,
                applied_epochs=sorted(epochs),
                summary=summary or {},
                committed_at=time.time(),
                tombstone_stats=self._merge_tombstone_stats(
                    head,
                    written,
                    touched_buckets,
                    overwrite_all,
                    written_stats,
                    event_time_col,
                ),
                file_stats=self._merge_file_stats(
                    head, files, written_file_stats, event_time_col
                ),
            )
            if self._publish(snap):
                return snap
            # Lost the race. Re-read the winner's head and decide:
            new_head = self.snapshot()
            if applied_epoch is not None and applied_epoch in new_head.applied_epochs:
                return new_head  # the other writer applied this epoch
            if overwrite_all:
                # A full-table rewrite is derived from the pre-race
                # snapshot; republishing it would erase whatever the
                # winner committed in between (and adopting the winner's
                # applied_epochs would suppress replay of the lost
                # epoch). Never rebase — the caller re-derives from the
                # new head (compact/rebucket are pure maintenance, so a
                # rerun is always safe).
                raise CommitConflictError(
                    f"concurrent commit v{new_head.version} landed while "
                    "this overwrite_all commit was derived from "
                    f"v{head.version}; re-derive the rewrite from the "
                    "new head and retry"
                )
            if (
                new_head.n_buckets != base_n_buckets
                or new_head.key_cols != base_key_cols
            ):
                # The winner changed the bucketing spec: this commit's
                # data was hashed under the old (n_buckets, key_cols),
                # so merging its files into the new layout would place
                # rows in buckets pruned reads will never look in.
                raise CommitConflictError(
                    f"concurrent commit v{new_head.version} changed the "
                    f"bucket spec ({base_n_buckets} x {base_key_cols} -> "
                    f"{new_head.n_buckets} x {new_head.key_cols}) while "
                    "this commit's data was bucketed under the old one; "
                    "re-bucket the data against the new head"
                )
            # Write-write conflict: the winner changed a bucket this
            # commit is about to replace — its rows were merged
            # against a stale current-side read, so a rebase would
            # silently drop the winner's changes. Fail loudly.
            clashed = [
                b
                for b in (touched_buckets or [])
                if new_head.files.get(str(b)) != head.files.get(str(b))
            ]
            if clashed:
                raise CommitConflictError(
                    f"concurrent commit v{new_head.version} rewrote "
                    f"buckets {clashed[:8]} that this commit also "
                    "touches; re-run the merge against the new head"
                )
            head = new_head
            # fresh id so snapshot versions stay monotone with commit
            # order (the claimed data dir's files remain referenced by
            # their recorded relative paths)
            version = self._claim_version()

    def append(
        self,
        df: DataFrame,
        summary: dict | None = None,
        event_time_col: str | None = None,
        max_records_per_file: int | None = None,
    ) -> Snapshot:
        """Append-only commit (the lineage/audit path): rows hash into
        the table's fixed ``n_buckets`` and the new files EXTEND each
        bucket's file list — nothing existing is rewritten. Bucket
        count stays bounded; what grows per append is files-per-bucket,
        which is why append-mode tables need periodic
        ``compact_files``. ``event_time_col``: cluster the appended
        files on that column and record their per-file [min, max]
        bounds (``read(time_range=...)`` then skips whole appends
        outside the window — the append-table pruning story)."""
        head = self.snapshot()
        version = self._claim_version()
        with_bucket = df.withColumn(
            BUCKET_COL, bucket_expr(head.key_cols, head.n_buckets)
        )
        written = self._write_data(
            with_bucket,
            version,
            sort_col=event_time_col,
            max_records_per_file=max_records_per_file,
        )
        written_file_stats = None
        if event_time_col is not None and written:
            _, written_file_stats = self._scan_write_stats(
                df.sparkSession, written, event_time_col, head.schema
            )
        # Appends only EXTEND file lists, so a lost commit race always
        # rebases cleanly onto the winner's head (no overlap possible)
        # — UNLESS the winner changed the bucketing spec, in which case
        # these files were hashed under the old layout and pruned reads
        # would look for their keys in the wrong bucket.
        base_n_buckets = head.n_buckets
        base_key_cols = list(head.key_cols)
        while True:
            files = dict(head.files)
            for bucket, paths in written.items():
                files.setdefault(bucket, [])
                files[bucket] = files[bucket] + paths
            snap = Snapshot(
                version=version,
                parent=head.version,
                schema_json=head.schema_json,
                key_cols=head.key_cols,
                n_buckets=head.n_buckets,
                files=files,
                applied_epochs=list(head.applied_epochs),
                summary=summary or {"operation": "append"},
                committed_at=time.time(),
                # appended buckets' tombstone state becomes unknown
                tombstone_stats=self._merge_tombstone_stats(
                    head, written, None, False, None, None
                ),
                file_stats=self._merge_file_stats(
                    head, files, written_file_stats, event_time_col
                ),
            )
            if self._publish(snap):
                return snap
            head = self.snapshot()
            if (
                head.n_buckets != base_n_buckets
                or head.key_cols != base_key_cols
            ):
                raise CommitConflictError(
                    f"concurrent commit v{head.version} changed the "
                    f"bucket spec ({base_n_buckets} x {base_key_cols} -> "
                    f"{head.n_buckets} x {head.key_cols}) while this "
                    "append's data was bucketed under the old one; "
                    "re-append against the new head"
                )
            version = self._claim_version()

    # -- schema evolution -----------------------------------------------------
    def add_columns(self, new_fields: list[T.StructField]) -> Snapshot:
        """Additive schema evolution (metadata-only commit): old files
        keep their layout and read the new columns as null — the
        `lang appearing mid-stream` scenario of the north rule."""
        head = self.snapshot()
        existing = {f.name for f in head.schema.fields}
        added = [f for f in new_fields if f.name not in existing]
        if not added:
            return head
        new_schema = T.StructType(head.schema.fields + added)
        return self.commit(
            None,
            schema=new_schema,
            summary={"operation": "add_columns", "columns": [f.name for f in added]},
        )

    # -- maintenance ------------------------------------------------------------
    def expire_snapshots(
        self, keep_last: int = 2, orphan_grace_s: float = 3600.0
    ) -> list[int]:
        """GC data directories only reachable from expired snapshots.
        (Iceberg's expire_snapshots analog; keeps time travel shallow.)

        Also sweeps lost-race artifacts: a commit loser's first claim
        never gets a snapshot published under its id (the loser
        re-claims a fresh id, or returns early when the winner already
        applied its epoch), so the claim file — and, on the
        exactly-once-early-return path, an entire written-but-never-
        referenced data/v<claim> directory — would otherwise leak
        forever. A claim below HEAD with no snapshot json is such an
        orphan; ``orphan_grace_s`` protects a still-in-flight writer
        (its eventual snapshot may reference its claim's data dir by
        relative path) — only claims older than the grace are swept,
        and only files unreferenced by every surviving snapshot are
        deleted (Iceberg's remove_orphan_files age guard)."""
        versions = self.versions()
        head = self.head_version()
        # keep_last=0 must mean "only what HEAD needs" — a bare
        # versions[-0:] slice would be the whole list (keep everything).
        keep = set(versions[-keep_last:]) if keep_last > 0 else set()
        keep.add(head)
        live_files: set[str] = set()
        for v in keep:
            snap = self.snapshot(v)
            live_files.update(p for plist in snap.files.values() for p in plist)
        removed = []
        for v in versions:
            if v in keep:
                continue
            snap = self.snapshot(v)
            for plist in snap.files.values():
                for p in plist:
                    if p not in live_files:
                        full = os.path.join(self.root, p)
                        if os.path.exists(full):
                            os.remove(full)
            os.remove(self._snap_path(v))
            claim = self._snap_path(v) + ".claim"
            if os.path.exists(claim):
                os.remove(claim)  # id can't be reused: higher snapshots exist
            removed.append(v)
        self._sweep_orphan_claims(head, live_files, orphan_grace_s)
        return removed

    def _sweep_orphan_claims(
        self, head: int, live_files: set[str], grace_s: float
    ) -> None:
        """Remove aged claims below HEAD that no snapshot was ever
        published under, plus their data files that no surviving
        snapshot references (see expire_snapshots docstring)."""
        snap_dir = os.path.join(self.root, "_snapshots")
        now = time.time()
        for entry in os.listdir(snap_dir):
            if not entry.endswith(".claim"):
                continue
            v = int(entry[1:].split(".", 1)[0])
            claim = os.path.join(snap_dir, entry)
            if (
                v >= head
                or os.path.exists(self._snap_path(v))
                or now - os.path.getmtime(claim) < grace_s
            ):
                continue
            data_dir = self._data_dir(v)
            if os.path.isdir(data_dir):
                for dirpath, _dirs, names in os.walk(data_dir, topdown=False):
                    for name in names:
                        full = os.path.join(dirpath, name)
                        rel = os.path.relpath(full, self.root)
                        if rel not in live_files:
                            os.remove(full)
                    if not os.listdir(dirpath):
                        os.rmdir(dirpath)
            os.remove(claim)

    def compact_files(
        self, spark: SparkSession, max_files: int = 64, rebucket: bool = False
    ) -> Snapshot:
        """Rewrite the table into one file per bucket when fragmentation
        exceeds ``max_files`` (the append path adds one file set per
        epoch: at 10^5 epochs an audit table is 10^5 tiny files and
        every scan pays per-file open cost — Iceberg's
        rewrite_data_files analog). The commit is a normal snapshot
        (rollback-able) and a no-op below the threshold, so it can run
        after every N epochs.

        ``rebucket=False`` (default) preserves each row's EXISTING
        stored bucket — mandatory for tables with a non-default layout
        (the rollup table identity-buckets on src_bucket and its epoch
        commits depend on that manifest keying; re-hashing would
        scatter rows across manifest keys and corrupt later
        bucket-granular replaces). ``rebucket=True`` re-derives buckets
        from the key columns instead of trusting the stored values —
        for append-mode tables (lineage) whose rows were hashed with
        the same ``bucket_expr`` this re-derivation is a no-op, so it
        is only worth paying when stored bucket values are suspect
        (e.g. files imported from elsewhere). Either way the bucket
        COUNT is already bounded at ``n_buckets``; what compaction
        collapses is the per-bucket file lists the append path grows
        one set per epoch."""
        # Losing a publish race as an overwrite_all commit raises
        # (rebasing a full rewrite would erase the winner's changes);
        # compaction is pure maintenance, so the correct response is to
        # re-derive the rewrite from the new head and try again.
        for _ in range(3):
            snap = self.snapshot()
            n_files = sum(len(p) for p in snap.files.values())
            if n_files <= max_files:
                return snap
            if rebucket:
                df = self.read(spark, with_bucket=False, include_deleted=True)
                df = df.withColumn(
                    BUCKET_COL, bucket_expr(snap.key_cols, snap.n_buckets)
                )
            else:
                df = self.read(spark, with_bucket=True, include_deleted=True)
            try:
                return self.commit(
                    df,
                    overwrite_all=True,
                    # NOT already-partitioned: the repartition(BUCKET_COL)
                    # inside _write_data is what collapses each bucket to
                    # one file. Recompute tombstone stats under the column
                    # already on record so the full rewrite doesn't reset
                    # GC pruning.
                    event_time_col=(snap.tombstone_stats or {}).get("col")
                    or (snap.file_stats or {}).get("col"),
                    summary={
                        "operation": "compact_files",
                        "was_files": n_files,
                    },
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            "compact_files lost the commit race 3 times; table is under "
            "heavy concurrent write — re-run compaction later"
        )

    def rebucket(self, spark: SparkSession, new_n_buckets: int) -> Snapshot:
        """Partition-spec evolution: rewrite the table into a new bucket
        count (Iceberg's evolve-partition-spec + rewrite analog).

        At 10^10+ rows a bucket count chosen at table creation is
        eventually wrong — buckets outgrow executor memory for the
        grouped-map merge and the touched-list loses pruning power —
        so growth has to be a supported lifecycle operation, not a
        table rebuild. One shuffle (repartition by the new bucket in
        _write_data); tombstones ride along (include_deleted), so
        late-event arbitration survives the migration; applied-epoch
        bookkeeping is untouched, so replay/resume still works. NOTE:
        derived tables keyed by this table's bucket ids (the rollup's
        src_bucket partials) must be refreshed afterwards — use
        pipeline.rebucket_warehouse, which does both.
        """
        if new_n_buckets <= 0:
            raise ValueError("new_n_buckets must be positive")
        # Same re-derive-on-lost-race loop as compact_files: the rewrite
        # is a pure function of the head snapshot.
        for _ in range(3):
            head = self.snapshot()
            if new_n_buckets == head.n_buckets:
                return head
            df = self.read(spark, with_bucket=False, include_deleted=True)
            df = df.withColumn(
                BUCKET_COL, bucket_expr(head.key_cols, new_n_buckets)
            )
            try:
                return self.commit(
                    df,
                    overwrite_all=True,
                    n_buckets=new_n_buckets,
                    event_time_col=(head.tombstone_stats or {}).get("col")
                    or (head.file_stats or {}).get("col"),
                    summary={
                        "operation": "rebucket",
                        "from": head.n_buckets,
                        "to": new_n_buckets,
                    },
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            "rebucket lost the commit race 3 times; table is under heavy "
            "concurrent write — re-run later"
        )

    def expire_tombstones(
        self, spark: SparkSession, older_than, event_time_col: str
    ) -> Snapshot:
        """Drop delete markers whose ``event_time_col`` is older than
        the stream's late-event horizon (a timestamp or literal
        string). The event-time column is the caller's to name — the
        table format is schema-agnostic; the pipeline layer supplies
        the pages convention (``warc_ts``).

        Past the horizon no event older than the marker can still
        arrive, so the marker is dead weight — dropping it bounds
        retained tombstone state by delete-rate x horizon instead of
        full delete history (Iceberg's delete-file compaction analog,
        same role as the reference's day-partition DELETE cleanups).
        Bucket-granular: only buckets holding expirable markers are
        rewritten; the commit is a normal snapshot (rollback-able), not
        an epoch, so replay bookkeeping is untouched.

        Discovery is manifest-pruned: commits record per-bucket
        [tombstone count, min event time] (``tombstone_stats``), so the
        scan touches only buckets whose recorded min is past the
        horizon (plus any bucket with unknown state); at 100 TB a GC
        pass with nothing expirable costs zero data reads instead of a
        whole-table scan. Buckets written before stats existed fall
        back to being scanned once, after which their state is known.
        """
        snap = self.snapshot()
        if not any(f.name == DELETED_COL for f in snap.schema.fields):
            return snap
        candidates = self._expirable_candidates(snap, older_than, event_time_col)
        if candidates is not None and not candidates:
            return snap  # manifest proves nothing is expirable: no scan
        horizon = F.to_timestamp(F.lit(older_than)) if isinstance(older_than, str) else F.lit(older_than)
        is_dead = F.coalesce(F.col(DELETED_COL), F.lit(False)) & (
            F.col(event_time_col) < horizon
        )
        scan = self.read(
            spark, buckets=candidates, with_bucket=True, include_deleted=True
        )
        touched = [
            int(r[0])
            for r in scan.filter(is_dead).select(BUCKET_COL).distinct().collect()
        ]
        if not touched:
            return snap
        survivors = self.read(
            spark, buckets=touched, with_bucket=True, include_deleted=True
        ).filter(~is_dead)
        return self.commit(
            survivors,
            touched_buckets=touched,
            event_time_col=event_time_col,
            summary={
                "operation": "expire_tombstones",
                "buckets": len(touched),
            },
        )

    @staticmethod
    def _expirable_candidates(
        snap: Snapshot, older_than, event_time_col: str
    ) -> list[int] | None:
        """Buckets that COULD hold an expirable tombstone, per the
        manifest stats: known-min past the horizon, or state unknown.
        None = no usable stats (or unparseable horizon) -> scan all."""
        import datetime as dt

        stats = snap.tombstone_stats or {}
        if stats.get("col") != event_time_col:
            return None
        if isinstance(older_than, dt.datetime):
            horizon_py = older_than
        else:
            try:
                horizon_py = dt.datetime.fromisoformat(str(older_than))
            except ValueError:
                return None
        if horizon_py.tzinfo is not None:
            # recorded mins are session-naive; don't guess a tz mapping
            return None
        known = stats.get("buckets", {})
        out = []
        for b in snap.files:
            ent = known.get(b)
            if ent is None:
                out.append(int(b))  # unknown state: must scan
                continue
            n, mn = ent
            if n and mn is not None and dt.datetime.fromisoformat(mn) < horizon_py:
                out.append(int(b))
        return out
