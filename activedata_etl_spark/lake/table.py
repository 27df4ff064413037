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
            "n_buckets": n_buckets,
            "batch_id": -1,
            "watermarks": {},
            "bucket_dirs": {},      # bucket id (str) -> data dir relpath
            "dir_versions": {},     # data dir relpath -> writer snapshot version
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

    def read(
        self,
        buckets: list[int] | None = None,
        include_tombstones: bool = False,
    ) -> DataFrame:
        """Scan the table (optionally bucket-pruned), aligned to the current
        schema.

        Data dirs written by older snapshots may have narrower physical
        schemas (pre-widening); each same-version group is read in one
        parquet scan and upcast on the fly — column pruning and predicate
        pushdown still reach the parquet reader because alignment is a plain
        projection on top of the scan.
        """
        snap = self.snapshot()
        schema = T.StructType.fromJson(snap["schema"])
        bucket_dirs = snap["bucket_dirs"]
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            bucket_dirs = {b: d for b, d in bucket_dirs.items() if b in wanted}

        # group bucket paths by the snapshot version that wrote them
        by_version: dict[int, list[str]] = {}
        for b, d in bucket_dirs.items():
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
            out = self.spark.createDataFrame([], schema)
        else:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
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

    # -------------------------------------------------------- maintenance

    def compact(self, drop_tombstones: bool = False) -> int:
        """Rewrite every bucket at the current schema in one new snapshot
        (analog of re-ETL block consolidation; removes read-time union/cast).

        ``drop_tombstones=True`` garbage-collects delete markers — safe once
        the out-of-order horizon has passed (no stale event older than the
        tombstone can still arrive)."""
        snap = self.snapshot()
        new_version = snap["version"] + 1
        df = self.read(include_tombstones=not drop_tombstones)
        if DELETED_COL not in df.columns:
            df = df.withColumn(DELETED_COL, F.lit(False))
        df = self.bucket_of(df)
        rel = self.write_buckets(df, new_version)
        new = dict(snap)
        new["version"] = new_version
        new["parent"] = snap["version"]
        new["ts_ms"] = int(time.time() * 1000)
        new["bucket_dirs"] = {b: rel for b in self.written_buckets(rel)}
        new["dir_versions"] = {rel: new_version}
        self._commit_snapshot(new)
        return new_version

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
        new = dict(snap)
        new["version"] = new_version
        new["parent"] = snap["version"]
        new["ts_ms"] = int(time.time() * 1000)
        # repoint from what was WRITTEN, not from the old snapshot's bucket
        # set: a SET on a key column moves rows to new buckets (which must
        # become visible) and can empty old ones (which must be dropped)
        new["bucket_dirs"] = {b: rel for b in self.written_buckets(rel)}
        new["dir_versions"] = {rel: new_version}
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

    # ---------------------------------------------------------------- misc

    def read_lineage(self) -> DataFrame:
        snap = self.snapshot()
        dirs = [os.path.join(self.location, d) for d in snap.get("lineage_dirs", [])]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            raise FileNotFoundError("no lineage recorded yet")
        return self.spark.read.parquet(*dirs)
