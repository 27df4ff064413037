"""SnapshotTable — an ACID, snapshot-isolated lake table over parquet.

This sandbox ships no Iceberg/Delta runtime jars and has no network, so the
engine implements the same contract itself, Iceberg-style:

- a table is a directory; its state is an immutable **snapshot** JSON under
  ``metadata/v{N}.json`` listing the data files, the schema, the exactly-once
  state (last applied ``batch_id`` + per-journal-partition watermarks), and a
  pointer to its parent snapshot;
- a commit writes the new snapshot file then **atomically swaps** the
  ``metadata/_current`` pointer (``os.replace``) — readers always see a
  complete snapshot, never a partial write (single-writer per table; a real
  deployment swaps this pointer through a catalog CAS, exactly as Iceberg
  does — the rest of the engine is unchanged);
- data is hash-bucketed by the key columns into ``n_buckets`` buckets
  (Iceberg ``bucket(N, key)`` partition transform).  A MERGE is
  **copy-on-write at bucket granularity**: only buckets containing changed
  keys are rewritten; untouched buckets keep their old files.  At 10^10 rows
  the per-batch write cost is O(touched buckets), not O(table);
- watermark-in-commit: the per-partition high-watermark offsets live INSIDE
  the snapshot, so data and watermark commit atomically together — the analog
  of the reference persisting ``SYNCHRONIZATION_KEY`` next to the data
  (`activedata_etl/pulse_logger.py:126-138`) and acking SQS only after the
  sink write (`activedata_etl/push_to_es.py:86`).

Reference parity: LWW upsert semantics from ``_id + version_type=
external_gte`` (`vendor/pyLibrary/env/elasticsearch.py:328-331,374-380`),
idempotent block merge (`activedata_etl/sinks/s3_bucket.py:92-118`), rollover
partitioning/expiry (`vendor/pyLibrary/env/rollover_index.py:69-263`).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from activedata_etl_spark.lake.schema_evolution import align_to_schema

BUCKET_COL = "__bucket"
DELETED_COL = "__deleted"  # tombstone marker: delete events upsert a
                           # versioned tombstone so stale out-of-order
                           # arrivals cannot resurrect the key

# MOR-lite target: ~250MB of parquet per bucket keeps a bucket rewrite an
# executor-sized task at any table size (10^10 rows x ~200B -> ~8k buckets)
TARGET_BUCKET_BYTES = 250 * 1024 * 1024


def suggest_n_buckets(
    expected_rows: int,
    avg_row_bytes: int = 200,
    target_bucket_bytes: int = TARGET_BUCKET_BYTES,
    min_buckets: int = 8,
    max_buckets: int = 1 << 16,
) -> int:
    """Size the bucket count from expected table rows so each bucket holds
    ~``target_bucket_bytes`` of parquet.  Too few buckets makes every CoW
    rewrite giant; too many makes small files and metadata bloat.  The analog
    of the reference sizing rollover indexes by expected volume
    (`vendor/pyLibrary/env/rollover_index.py:69-104`)."""
    est_bytes = max(0, int(expected_rows)) * max(1, avg_row_bytes)
    n = max(min_buckets, -(-est_bytes // target_bucket_bytes))
    return int(min(n, max_buckets))


def _bucket_expr(key_cols: list[str], n_buckets: int):
    """Murmur3 (F.hash) on purpose: it is the SAME hash Spark's shuffle
    hash-partitioning uses, so rows hash-partitioned by the key columns land
    with whole buckets per partition — the bucketed write then needs NO
    repartition (zero-shuffle write)."""
    return F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    """Single-writer ACID table: snapshot metadata + bucketed parquet data."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location.rstrip("/")
        self.meta_dir = os.path.join(self.location, "metadata")

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        location: str,
        schema: T.StructType,
        key_cols: list[str],
        *,
        n_buckets: int = 64,
        version_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> "SnapshotTable":
        t = cls(spark, location)
        os.makedirs(t.meta_dir, exist_ok=True)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {location}")
        if DELETED_COL not in {f.name for f in schema.fields}:
            # every table carries the tombstone marker: apply_batch's merge
            # expressions reference it unconditionally, and a table created
            # without it would fail analysis mid-batch
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField(DELETED_COL, T.BooleanType(), True)]
            )
        snap = {
            "version": 0,
            "parent": None,
            "ts_ms": int(time.time() * 1000),
            "schema": schema.jsonValue(),
            "key_cols": key_cols,
            "version_cols": list(version_cols or ["commit_seq", "offset"]),
            "n_buckets": n_buckets,
            "batch_id": -1,
            "watermarks": {},
            "bucket_dirs": {},      # bucket id (str) -> data dir relpath
            "dir_versions": {},     # data dir relpath -> writer snapshot version
            "delta_dirs": {},       # bucket id (str) -> [data dir relpaths]
                                    # (MOR-lite: LWW-merged with base on read)
            "bucket_rows": {},      # bucket id (str) -> base row count
            "lineage_dirs": [],
            "properties": properties or {},
        }
        t._commit_snapshot(snap)
        return t

    @classmethod
    def exists(cls, spark: SparkSession, location: str) -> bool:
        return os.path.exists(os.path.join(location, "metadata", "_current"))

    # ------------------------------------------------------------- metadata

    def current_version(self) -> int | None:
        p = os.path.join(self.meta_dir, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshot at {self.location}")
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.snapshot()["schema"])

    def watermarks(self) -> dict[int, int]:
        return {int(k): int(v) for k, v in self.snapshot()["watermarks"].items()}

    def last_batch_id(self) -> int:
        return int(self.snapshot()["batch_id"])

    def _commit_snapshot(self, snap: dict) -> None:
        """Write v{N}.json then atomically swap the _current pointer."""
        v = snap["version"]
        path = os.path.join(self.meta_dir, f"v{v}.json")
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        cur_tmp = os.path.join(self.meta_dir, f"_current.tmp.{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(v))
        os.replace(cur_tmp, os.path.join(self.meta_dir, "_current"))

    # ----------------------------------------------------------------- read

    def _aligned_scan(
        self, snap: dict, schema: T.StructType, pairs: list[tuple[str, str]]
    ) -> DataFrame | None:
        """Scan (dir relpath, bucket id) pairs aligned to ``schema``.

        Data dirs written by older snapshots may have narrower physical
        schemas (pre-widening); each same-version group is read in one
        parquet scan and upcast on the fly — column pruning and predicate
        pushdown still reach the parquet reader because alignment is a plain
        projection on top of the scan.
        """
        by_version: dict[int, list[str]] = {}
        for d, b in pairs:
            ver = snap["dir_versions"][d]
            by_version.setdefault(ver, []).append(
                os.path.join(self.location, d, f"{BUCKET_COL}={b}")
            )
        parts: list[DataFrame] = []
        for _, paths in sorted(by_version.items()):
            existing = [p for p in paths if os.path.exists(p)]
            if not existing:
                continue
            raw = self.spark.read.parquet(*existing)
            parts.append(align_to_schema(raw, schema))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        buckets: list[int] | None = None,
        include_tombstones: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """Scan the table (optionally bucket-pruned), aligned to the
        snapshot's schema.

        ``version`` pins the read to an older snapshot (Iceberg time travel:
        every snapshot is self-contained, immutable file lists + schema), as
        long as ``expire_snapshots`` has not pruned it — readers holding a
        version are never affected by concurrent commits.

        Buckets that carry MOR-lite delta files (small incremental batches,
        see ``merge.apply_batch(merge_mode=...)``) are merged at read time:
        base ∪ deltas reduced last-writer-wins on the table's version columns
        — the same structmax HashAggregate the write path uses, confined to
        exactly the buckets that have deltas.  Buckets without deltas take
        the plain scan path with zero overhead.
        """
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        wanted = None if buckets is None else {str(b) for b in buckets}
        delta_dirs = {
            b: rels for b, rels in snap.get("delta_dirs", {}).items()
            if rels and (wanted is None or b in wanted)
        }
        bucket_dirs = {
            b: d for b, d in snap["bucket_dirs"].items()
            if wanted is None or b in wanted
        }

        out = self._aligned_scan(
            snap, schema,
            [(d, b) for b, d in bucket_dirs.items() if b not in delta_dirs],
        )
        if delta_dirs:
            pairs = [
                (bucket_dirs[b], b) for b in delta_dirs if b in bucket_dirs
            ] + [(rel, b) for b, rels in delta_dirs.items() for rel in rels]
            raw = self._aligned_scan(snap, schema, pairs)
            if raw is not None:
                vcols = snap.get("version_cols")
                if not vcols:
                    raise ValueError(
                        f"table {self.location} has delta files but no "
                        "version_cols recorded — cannot LWW-merge on read"
                    )
                from activedata_etl_spark.operators.lww import (
                    lww_reduce_structmax,
                )

                merged = lww_reduce_structmax(raw, snap["key_cols"], vcols)
                out = merged if out is None else out.unionByName(merged)
        if out is None:
            out = self.spark.createDataFrame([], schema)
        if not include_tombstones and DELETED_COL in out.columns:
            out = out.where(
                ~F.coalesce(F.col(DELETED_COL), F.lit(False))
            ).drop(DELETED_COL)
        return out

    def existing_bucket_paths(self, buckets: list[int]) -> list[str]:
        """Physical data paths among ``buckets`` (a delete can empty a bucket,
        leaving a dangling metadata pointer — those are skipped)."""
        snap = self.snapshot()
        out = []
        for b in buckets:
            d = snap["bucket_dirs"].get(str(b))
            if d is None:
                continue
            p = os.path.join(self.location, d, f"{BUCKET_COL}={b}")
            if os.path.exists(p):
                out.append(p)
        return out

    def bucket_of(self, df: DataFrame) -> DataFrame:
        snap = self.snapshot()
        return df.withColumn(
            BUCKET_COL, _bucket_expr(snap["key_cols"], snap["n_buckets"])
        )

    # ------------------------------------------------------------ data write

    def write_buckets(self, df: DataFrame, version: int) -> str:
        """Write ``df`` (must carry BUCKET_COL) under data/v{version}.

        NO repartition: the caller's plan is already hash-partitioned by the
        key columns (LWW window / merge join), and bucket = murmur3(keys) %
        n_buckets is aligned with that partitioning, so every task holds
        whole buckets — ``partitionBy`` emits at most one file per bucket per
        task with zero extra shuffle.  ``sortWithinPartitions`` groups each
        task's rows by bucket so the dynamic-partition writer keeps a single
        open file at a time.
        """
        rel = f"data/v{version}"
        out = os.path.join(self.location, rel)
        (
            df.sortWithinPartitions(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out)
        )
        return rel

    def written_buckets(self, rel: str) -> list[str]:
        """Bucket ids actually present under a written data dir (from the
        dynamic-partition directory names; no Spark job)."""
        root = os.path.join(self.location, rel)
        prefix = f"{BUCKET_COL}="
        if not os.path.isdir(root):
            return []
        return sorted(
            (d[len(prefix):] for d in os.listdir(root) if d.startswith(prefix)),
            key=int,
        )

    def written_bucket_rows(self, rel: str) -> dict[str, int]:
        """Exact per-bucket row counts of a just-written data dir from the
        parquet footers — driver-side, one footer per file, no Spark job.
        Commit records these so ``base_row_count`` (the CoW-vs-delta mode
        pick) never needs a table scan."""
        import glob as _glob

        import pyarrow.parquet as pq

        out: dict[str, int] = {}
        for b in self.written_buckets(rel):
            n = 0
            d = os.path.join(self.location, rel, f"{BUCKET_COL}={b}")
            for f in _glob.glob(os.path.join(d, "*.parquet")):
                n += pq.ParquetFile(f).metadata.num_rows
            out[b] = n
        return out

    def base_row_count(self) -> int | None:
        """Total base rows (incl. tombstones) from snapshot metadata; None
        when unknown (table predates per-commit accounting).  Delta rows are
        deliberately excluded: they mostly shadow existing keys, and
        undercounting only biases mode selection toward CoW (safe)."""
        snap = self.snapshot()
        counts = snap.get("bucket_rows") or {}
        live = [b for b in snap["bucket_dirs"]]
        if not live:
            return 0
        if any(b not in counts for b in live):
            return None
        return sum(int(counts[b]) for b in live)

    def dir_bytes(self, rel: str) -> int:
        """Physical bytes under a data dir (write-amplification accounting)."""
        total = 0
        for root, _, files in os.walk(os.path.join(self.location, rel)):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    # -------------------------------------------------------- maintenance

    def compact(
        self,
        drop_tombstones: bool = False,
        buckets: list[int] | None = None,
    ) -> int:
        """Rewrite buckets at the current schema in one new snapshot (analog
        of re-ETL block consolidation; removes read-time union/cast).
        MOR-lite delta files are folded into the base and cleared — ``read``
        already LWW-merges them, so compaction is read + rewrite.

        ``buckets`` limits the rewrite to a subset — at 10^10 rows the
        steady-state maintenance loop compacts ONLY the delta-carrying
        buckets (see ``maybe_compact``), never the whole table: cost is
        O(buckets compacted), untouched buckets keep their files.

        ``drop_tombstones=True`` garbage-collects delete markers — safe once
        the out-of-order horizon has passed (no stale event older than the
        tombstone can still arrive)."""
        snap = self.snapshot()
        new_version = snap["version"] + 1
        df = self.read(buckets=buckets, include_tombstones=not drop_tombstones)
        if DELETED_COL not in df.columns:
            df = df.withColumn(DELETED_COL, F.lit(False))
        df = self.bucket_of(df)
        rel = self.write_buckets(df, new_version)
        written = self.written_bucket_rows(rel)
        new = dict(snap)
        new["version"] = new_version
        new["parent"] = snap["version"]
        new["ts_ms"] = int(time.time() * 1000)
        if buckets is None:
            new["bucket_dirs"] = {b: rel for b in written}
            new["dir_versions"] = {rel: new_version}
            new["delta_dirs"] = {}
            new["bucket_rows"] = written
        else:
            scope = {str(b) for b in buckets}
            bucket_dirs = {b: d for b, d in snap["bucket_dirs"].items()
                           if b not in scope}
            bucket_rows = {b: n for b, n in snap.get("bucket_rows", {}).items()
                           if b not in scope}
            for b, n in written.items():
                bucket_dirs[b] = rel
                bucket_rows[b] = n
            new["bucket_dirs"] = bucket_dirs
            new["bucket_rows"] = bucket_rows
            new["delta_dirs"] = {
                b: rels for b, rels in snap.get("delta_dirs", {}).items()
                if b not in scope
            }
            # prune dir_versions to dirs this snapshot still references —
            # snapshot JSON stays O(buckets), not O(commits ever made)
            live = set(bucket_dirs.values()) | {
                r for rels in new["delta_dirs"].values() for r in rels
            } | {rel}
            new["dir_versions"] = {
                d: v for d, v in
                dict(snap["dir_versions"], **{rel: new_version}).items()
                if d in live
            }
        self._commit_snapshot(new)
        return new_version

    def delta_stats(self) -> dict:
        """Per-bucket delta file/dir pressure from snapshot metadata only —
        the input to the compaction policy; no filesystem walk, no job."""
        snap = self.snapshot()
        deltas = {b: len(r) for b, r in snap.get("delta_dirs", {}).items() if r}
        return {
            "buckets_with_deltas": len(deltas),
            "max_deltas_per_bucket": max(deltas.values(), default=0),
            "total_delta_dirs": sum(deltas.values()),
            "per_bucket": deltas,
        }

    def maybe_compact(
        self,
        max_deltas_per_bucket: int = 8,
        drop_tombstones: bool = False,
    ) -> int | None:
        """Steady-state maintenance hook: compact ONLY the buckets whose
        delta chain exceeds ``max_deltas_per_bucket``, bounding read-time
        merge work to a constant number of delta files per bucket while
        keeping compaction cost O(hot buckets), not O(table).  Returns the
        new snapshot version, or None when nothing crossed the threshold."""
        hot = [
            int(b) for b, n in self.delta_stats()["per_bucket"].items()
            if n > max_deltas_per_bucket
        ]
        if not hot:
            return None
        return self.compact(drop_tombstones=drop_tombstones, buckets=hot)

    def update_where(self, condition, set_exprs: dict) -> int:
        """UPDATE ... SET ... WHERE — the reference's in-place update
        (`ListContainer.update({"set","clear","where"})`,
        `vendor/jx_python/containers/list_usingPythonList.py:122-139`).
        Copy-on-write: rewrites the table at a new snapshot version."""
        snap = self.snapshot()
        df = self.read(include_tombstones=True)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        for name, expr in set_exprs.items():
            value = F.expr(expr) if isinstance(expr, str) else expr
            df = df.withColumn(name, F.when(cond, value).otherwise(F.col(name)))
        return self._rewrite(snap, df)

    def delete_where(self, condition) -> int:
        """DELETE FROM ... WHERE (`Index.delete_record`,
        `vendor/pyLibrary/env/elasticsearch.py:241`).  Rows are physically
        removed (maintenance op, not a CDC tombstone)."""
        snap = self.snapshot()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        df = self.read(include_tombstones=True).where(~F.coalesce(cond, F.lit(False)))
        return self._rewrite(snap, df)

    def _rewrite(self, snap: dict, df: DataFrame) -> int:
        new_version = snap["version"] + 1
        df = self.bucket_of(df)
        rel = self.write_buckets(df, new_version)
        bucket_rows = self.written_bucket_rows(rel)
        new = dict(snap)
        new["version"] = new_version
        new["parent"] = snap["version"]
        new["ts_ms"] = int(time.time() * 1000)
        # repoint from what was WRITTEN, not from the old snapshot's bucket
        # set: a SET on a key column moves rows to new buckets (which must
        # become visible) and can empty old ones (which must be dropped).
        # ``read`` folded any deltas into the rewritten rows, so clear them.
        new["bucket_dirs"] = {b: rel for b in bucket_rows}
        new["dir_versions"] = {rel: new_version}
        new["delta_dirs"] = {}
        new["bucket_rows"] = bucket_rows
        self._commit_snapshot(new)
        return new_version

    def expire_snapshots(self, keep_last: int = 2) -> list[str]:
        """Drop snapshot files and data dirs unreachable from the newest
        ``keep_last`` snapshots (Iceberg ``expireSnapshots`` analog)."""
        cur = self.current_version()
        if cur is None:
            return []
        keep_versions = set(range(max(0, cur - keep_last + 1), cur + 1))
        live_dirs: set[str] = set()
        for v in keep_versions:
            p = os.path.join(self.meta_dir, f"v{v}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                s = json.load(f)
            live_dirs.update(s["bucket_dirs"].values())
            for rels in s.get("delta_dirs", {}).values():
                live_dirs.update(rels)
            live_dirs.update(s.get("lineage_dirs", []))
        removed = []
        data_root = os.path.join(self.location, "data")
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                rel = f"data/{d}"
                if rel not in live_dirs:
                    shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                    removed.append(rel)
        # lineage dirs orphaned by consolidation (merge.py folds old
        # per-commit dirs into one) or by snapshot expiry
        lin_root = os.path.join(self.location, "lineage")
        if os.path.isdir(lin_root):
            for d in os.listdir(lin_root):
                rel = f"lineage/{d}"
                if rel not in live_dirs:
                    shutil.rmtree(os.path.join(lin_root, d), ignore_errors=True)
                    removed.append(rel)
        for fn in os.listdir(self.meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                v = int(fn[1:-5])
                if v not in keep_versions:
                    os.remove(os.path.join(self.meta_dir, fn))
                    removed.append(f"metadata/{fn}")
        return removed

    def analyze(self, columns: list[str] | None = None) -> dict:
        """Column statistics maintenance op: per-column non-null count,
        approximate cardinality (HLL), min and max, computed in ONE
        distributed pass and committed into the snapshot properties — the
        analog of the reference's background column-metadata daemon
        (`vendor/jx_elasticsearch/meta.py:338,546` cardinality sampling),
        re-expressed as an explicit Iceberg-style ANALYZE.

        Stats serve planning/inspection (e.g. `suggest_n_buckets` re-sizing,
        pruning decisions); nothing consumes them automatically yet.
        Returns the stats dict; readable later via
        ``snapshot()["properties"]["column_stats"]``.
        """
        snap = self.snapshot()
        schema = T.StructType.fromJson(snap["schema"])
        atomic = (T.NumericType, T.StringType, T.TimestampType, T.DateType,
                  T.BooleanType)
        names = [
            f.name for f in schema.fields
            if (columns is None or f.name in columns)
            and isinstance(f.dataType, atomic) and f.name != DELETED_COL
        ]
        df = self.read()
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in names:
            aggs += [
                F.count(c).alias(f"n__{c}"),
                F.approx_count_distinct(c).alias(f"card__{c}"),
                F.min(c).alias(f"min__{c}"),
                F.max(c).alias(f"max__{c}"),
            ]
        row = df.agg(*aggs).first().asDict()

        def _j(v):  # JSON-safe rendering for snapshot storage
            return v if v is None or isinstance(v, (int, float, bool, str)) \
                else str(v)

        stats = {
            "rows": int(row["__rows"]),
            "snapshot_version": snap["version"],
            "ts_ms": int(time.time() * 1000),
            "columns": {
                c: {
                    "count": int(row[f"n__{c}"]),
                    "null_count": int(row["__rows"]) - int(row[f"n__{c}"]),
                    "cardinality": int(row[f"card__{c}"]),
                    "min": _j(row[f"min__{c}"]),
                    "max": _j(row[f"max__{c}"]),
                }
                for c in names
            },
        }
        new = dict(snap)
        new["version"] = snap["version"] + 1
        new["parent"] = snap["version"]
        new["ts_ms"] = stats["ts_ms"]
        new.setdefault("properties", {})
        new["properties"] = dict(new["properties"], column_stats=stats)
        self._commit_snapshot(new)
        return stats

    # ---------------------------------------------------------------- misc

    def read_lineage(self) -> DataFrame:
        snap = self.snapshot()
        dirs = [os.path.join(self.location, d) for d in snap.get("lineage_dirs", [])]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            raise FileNotFoundError("no lineage recorded yet")
        return self.spark.read.parquet(*dirs)
