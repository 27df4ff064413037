"""Versioned MERGE INTO with exactly-once fencing — the CDC sink.

Semantics (reference parity):
- LWW upsert with version guard: ``WHEN MATCHED AND s.version >= t.version
  THEN UPDATE/DELETE`` — the ES ``version_type=external_gte`` policy where
  stale writes 409 and are swallowed
  (`vendor/pyLibrary/env/elasticsearch.py:328-331,374-380`);
- idempotent re-apply: replaying a whole batch is a no-op, both via the
  ``batch_id`` epoch fence and via the >= guard
  (`activedata_etl/sinks/s3_bucket.py:92-118` re-extend merge);
- delete events remove the key (`vendor/mo_hg/apply.py:101-114` dev/null);
- watermark-in-commit: per-partition high-watermark offsets are committed in
  the SAME snapshot as the data (`activedata_etl/pulse_logger.py:126-138`
  SYNCHRONIZATION_KEY; ack-after-write at `activedata_etl/push_to_es.py:86`);
- lineage per batch/partition (`EtlHeadGenerator`,
  `activedata_etl/transforms/__init__.py:210-239`).

Physical plan: within-batch LWW reduce (map-side combining hash agg) ->
bucket id (Iceberg-style hash bucket transform) -> FULL OUTER join against
ONLY the touched buckets of the table -> copy-on-write rewrite of those
buckets -> atomic snapshot swap.  Merge metrics ride the write job via
``DataFrame.observe`` (zero extra passes).
"""

from __future__ import annotations

import time
import uuid as _uuid
from itertools import chain

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from activedata_etl_spark import ENGINE_REVISION
from activedata_etl_spark.lake.schema_evolution import align_to_schema, merge_schemas
from activedata_etl_spark.lake.table import (
    BUCKET_COL,
    DELETED_COL,
    CommitConflictError,
    SnapshotTable,
)
from activedata_etl_spark.operators.lww import lww_reduce, lww_reduce_structmax

ENVELOPE_DROP = ["op", "partition"]  # journal envelope not stored in the table

# consolidate per-commit lineage dirs into one file past this many entries
# (keeps snapshot JSON + read_lineage O(1) instead of O(batches ever applied))
LINEAGE_CONSOLIDATE_AT = 256

LINEAGE_SCHEMA = (
    "batch_id long, partition int, min_offset long, max_offset long, "
    "rows_read long, below_watermark long, invalid_events long, "
    "late_events long, rows_applied long, "
    "deletes_applied long, merge_conflicts_resolved long, "
    "duration_ms long, engine_revision string"
)


def apply_batch(
    table: SnapshotTable,
    batch: DataFrame,
    batch_id: int,
    *,
    op_col: str = "op",
    version_cols: tuple[str, ...] = ("commit_seq", "offset"),
    partition_col: str = "partition",
    offset_col: str = "offset",
    salted: bool = False,
    validate_cols: tuple[str, ...] = ("repo", "path"),
    late_threshold_sec: int | None = None,
    ts_col: str = "ts",
    finalize_fn=None,
    persist: bool = True,
    enforce_watermark: bool = True,
    lineage_level: str = "full",
    precomputed_watermarks: dict[int, int] | None = None,
    lww_strategy: str = "structmax",
    merge_mode: str = "auto",
    delta_fraction: float = 0.05,
    advance_fence: bool = True,
) -> dict:
    """Apply one micro-batch of change events; returns a lineage summary.

    ``advance_fence=False`` is REPAIR mode: the batch is merged through the
    same versioned LWW path, but the commit keeps the table's batch fence
    and per-partition watermarks unchanged — committed chunks can be
    re-applied idempotently (the external_gte version guard makes stale
    rows lose, lost rows reinsert) without fencing anything in or out of
    later replays.  Callers must also disable ``enforce_watermark`` or the
    re-applied events are dropped at the watermark filter.

    ``merge_mode`` picks the physical write strategy:

    - ``"cow"``: copy-on-write — full-outer merge + rewrite of every touched
      bucket.  O(touched buckets) per batch: right for large batches, wrong
      for steady-state small ones (a 1%-of-keys batch touches nearly every
      bucket, so CoW rewrites the whole table — write amplification ≈
      table/batch).
    - ``"delta"``: MOR-lite — write ONLY the batch's LWW winners as delta
      files per bucket; ``SnapshotTable.read`` LWW-merges base ∪ deltas on
      the version columns, and ``compact()`` folds them back.  Write cost is
      O(batch); read pays one extra hash-agg on delta-carrying buckets until
      compaction.  Reference analog: incremental block re-extend that appends
      and merges-on-read (`activedata_etl/sinks/s3_bucket.py:92-118`).
      ``merge_conflicts_resolved`` is 0 here — conflicts resolve lazily at
      read/compaction time.
    - ``"auto"`` (default): delta when the batch's live rows are under
      ``delta_fraction`` of the table's base rows (from snapshot metadata, no
      scan), else CoW.  Falls back to CoW when the table is empty, row
      accounting is unavailable, or ``version_cols`` mismatch the table's.

    ``batch`` carries the journal envelope (partition, offset, op) plus the
    record payload; everything except ``ENVELOPE_DROP`` is stored (version
    columns stay in the table for the cross-batch >= guard).

    Deletes become TOMBSTONES (rows with ``__deleted = true``): a stale
    update arriving after the delete — in the same batch or a later one —
    loses to the tombstone's version instead of resurrecting the key.
    ``read()`` hides tombstones; compaction can drop those older than the
    out-of-order horizon.

    ``enforce_watermark`` drops events at-or-below the per-partition offset
    high-watermark — correct when delivery is offset-ordered per partition
    (chunked replay).  File-stream delivery is mtime-ordered, not
    offset-ordered, so the streaming driver disables it and relies on the
    epoch fence + version guard + tombstones, which are order-independent.
    """
    t0 = time.time()
    spark = table.spark
    snap = table.snapshot()
    key_cols = snap["key_cols"]

    # ---- pin key dtypes to the table's stored types --------------------
    # bucket = pmod(hash(keys), N) and F.hash(int) != F.hash(long) for equal
    # values, so a batch whose key column arrives wider (or narrower) than
    # the table's would file the same key under a DIFFERENT bucket than its
    # existing row — two live rows per key that no merge ever reconciles.
    # try_cast: an unrepresentable key becomes null and is quarantined below
    # (ANSI cast would abort the whole batch instead).
    from pyspark.sql import types as T

    tbl_types = {f.name: f.dataType
                 for f in T.StructType.fromJson(snap["schema"]).fields}
    for k in key_cols:
        if k in batch.columns and k in tbl_types \
                and batch.schema[k].dataType != tbl_types[k]:
            batch = batch.withColumn(k, F.col(k).try_cast(tbl_types[k]))

    # ---- epoch fence: a replayed batch is a no-op ----------------------
    # (repair mode bypasses it — re-applying committed chunks is the point)
    if advance_fence and batch_id <= int(snap["batch_id"]):
        return {"batch_id": batch_id, "skipped": True, "reason": "epoch_fenced"}

    # ---- watermark filter: already-applied offsets drop ----------------
    wm = table.watermarks()
    if wm and enforce_watermark:
        wm_map = F.create_map(
            *chain.from_iterable((F.lit(p), F.lit(o)) for p, o in wm.items())
        )
        below = F.col(offset_col) <= F.coalesce(
            wm_map[F.col(partition_col)], F.lit(-1)
        )
    else:
        below = F.lit(False)

    # ---- dead-letter + late-data flags (DATA_TOO_OLD analog,
    #      rollover_index.py:74-77; poison-pill rejection, etl.py:309-350) --
    invalid = F.lit(False)
    for c in validate_cols:
        if c in batch.columns:
            invalid = invalid | F.col(c).isNull()
    # a CDC event without a full key is malformed: it cannot be bucketed or
    # merged (and would otherwise emit a ghost all-null row through the
    # full-outer join's key_cols[0].isNotNull() presence test)
    for c in key_cols:
        if c in batch.columns:
            invalid = invalid | F.col(c).isNull()
    max_event_ts = snap.get("max_event_ts")  # epoch seconds, event-time WM
    if late_threshold_sec is not None and max_event_ts is not None and ts_col in batch.columns:
        late = F.unix_timestamp(F.col(ts_col)) < F.lit(
            int(max_event_ts) - late_threshold_sec
        )
        late = F.coalesce(late, F.lit(False))
    else:
        late = F.lit(False)

    from activedata_etl_spark.lake.table import _bucket_expr

    key_bucket = _bucket_expr(key_cols, snap["n_buckets"])
    flagged = (
        batch.withColumn("__below", below)
        .withColumn("__invalid", invalid)
        .withColumn("__late", late & ~invalid)
    )
    if lineage_level == "full":
        # full lineage collects the touched-bucket set PRE-reduce, so the
        # bucket id must exist on every event.  Summary mode defers it to
        # the LWW winners below: bucket = hash(keys) is constant within a
        # key group, so computing it per event only widened the reduce
        # shuffle and added a per-event murmur3 (measured ~6% of the reduce
        # stage) without changing any winner.
        flagged = flagged.withColumn(BUCKET_COL, key_bucket)
    drop_row = F.col("__below") | F.col("__invalid") | F.col("__late")
    has_ts = ts_col in batch.columns
    persisted = flagged
    if persist:
        persisted.persist()
    try:
        pre_obs = None
        if lineage_level == "full":
            # ONE pre-pass job: per-partition lineage counters + touched buckets
            part_rows = (
                flagged.groupBy(partition_col)
                .agg(
                    F.min(offset_col).alias("min_offset"),
                    F.max(offset_col).alias("max_offset"),
                    F.count(F.lit(1)).alias("rows_read"),
                    F.sum(F.col("__below").cast("long")).alias("below_watermark"),
                    F.sum(F.col("__invalid").cast("long")).alias("invalid_events"),
                    F.sum(F.col("__late").cast("long")).alias("late_events"),
                    # valid rows only: one corrupt future-dated event must
                    # NOT advance the event-time watermark (it would make
                    # every later real event "late" forever)
                    (F.max(F.when(~drop_row, F.unix_timestamp(ts_col)))
                     if has_ts else F.lit(None).cast("long")).alias("max_ts"),
                    F.collect_set(
                        F.when(~drop_row, F.col(BUCKET_COL))
                    ).alias("buckets"),
                )
                .collect()
            )
        else:
            # "summary": no pre-pass job — counters ride the merge job via a
            # second Observation; watermarks come precomputed (chunked replay
            # knows its disjoint offset range analytically); touched = all
            # buckets (large batches touch them all anyway).
            part_rows = []
            pre_obs = Observation(f"pre_b{batch_id}")
            flagged = flagged.observe(
                pre_obs,
                F.count(F.lit(1)).alias("rows_read"),
                F.sum(F.col("__below").cast("long")).alias("below_watermark"),
                F.sum(F.col("__invalid").cast("long")).alias("invalid_events"),
                F.sum(F.col("__late").cast("long")).alias("late_events"),
                F.min(offset_col).alias("min_offset"),
                F.max(offset_col).alias("max_offset"),
                (F.max(F.when(~drop_row, F.unix_timestamp(ts_col)))
                 if has_ts else F.max(F.lit(None).cast("long"))).alias("max_ts"),
            )

        t_pre = time.time()
        if lineage_level == "full":
            touched = sorted({b for r in part_rows for b in r["buckets"]})
        else:
            touched = list(range(snap["n_buckets"]))
        # partition id is lineage-only (consumed above via flagged); dropping
        # it here keeps the envelope column out of the reduce shuffle
        live = flagged.where(~drop_row).drop(
            "__below", "__invalid", "__late", partition_col
        )

        stored_cols = [c for c in batch.columns if c not in ENVELOPE_DROP]
        new_wm = dict(wm)
        for p, o in (precomputed_watermarks or {}).items():
            new_wm[int(p)] = max(new_wm.get(int(p), -1), int(o))
        batch_max_ts = None
        total_read = total_dropped = n_quarantined = 0
        if lineage_level == "full":
            for r in part_rows:
                p = int(r[partition_col])
                new_wm[p] = max(new_wm.get(p, -1), int(r["max_offset"]))
            batch_max_ts = max(
                (int(r["max_ts"]) for r in part_rows if r["max_ts"] is not None),
                default=None,
            )
            total_read = sum(r["rows_read"] for r in part_rows)
            total_dropped = sum(
                r["below_watermark"] + r["invalid_events"] + r["late_events"]
                for r in part_rows
            )
            n_quarantined = sum(
                r["invalid_events"] + r["late_events"] for r in part_rows
            )
        new_max_event_ts = max(
            (x for x in (max_event_ts, batch_max_ts) if x is not None), default=None
        )

        if n_quarantined:
            # quarantine table: malformed + too-late events, kept for audit
            import os as _os
            (
                flagged.where(F.col("__invalid") | F.col("__late"))
                .drop("__below", BUCKET_COL)
                .write.mode("overwrite")
                .parquet(_os.path.join(table.location, f"quarantine/b{batch_id}"))
            )

        if lineage_level == "full" and total_read == total_dropped:
            # nothing live: metadata-only commit (fence + watermark advance)
            s = _commit(
                table, snap, batch_id, new_wm, part_rows, None, None,
                schema_json=snap["schema"], changes=[],
                applied=0, deletes=0, conflicts=0, t0=t0,
                partition_col=partition_col, max_event_ts=new_max_event_ts,
                advance_fence=advance_fence,
            )
            s["pre_pass_ms"] = int((t_pre - t0) * 1000)
            return s

        # ---- within-batch LWW reduce (map-side combine handles skew) -----
        if salted:
            from activedata_etl_spark.operators.lww import lww_reduce_salted
            reduced = lww_reduce_salted(live, key_cols, list(version_cols))
        elif lww_strategy == "structmax":
            # single scan + single shuffle (HashAggregate over max(struct));
            # measured faster AND better-scaling than the agg+join-back
            reduced = lww_reduce_structmax(live, key_cols, list(version_cols))
        else:
            reduced = lww_reduce(live, key_cols, list(version_cols))
        if lineage_level != "full":
            # deferred bucket id: winners only (see the flagged comment)
            reduced = reduced.withColumn(BUCKET_COL, key_bucket)

        # ---- finalize transforms on WINNERS only (not on every event) ----
        if finalize_fn is not None:
            reduced = finalize_fn(reduced)
            stored_cols = [c for c in reduced.columns if c not in ENVELOPE_DROP
                           and c != BUCKET_COL]

        reduced_persisted = None
        reduced_count = None
        if lineage_level != "full" and snap["bucket_dirs"]:
            # summary mode used touched = ALL buckets, making every
            # incremental batch O(table): rewrite of every bucket.  The
            # winner set is tiny post-reduce, so persist it and read the
            # actually-touched buckets off it — merge cost returns to
            # O(touched).  (Skipped when the table is empty: the pure-upsert
            # path below never reads target buckets at all.)  One
            # groupBy(bucket) job yields BOTH the touched set and the winner
            # count the auto mode-pick needs — previously two full jobs per
            # incremental batch.
            reduced_persisted = reduced.persist()
            bucket_counts = (
                reduced_persisted.groupBy(BUCKET_COL).count().collect()
            )
            touched = sorted(int(r[0]) for r in bucket_counts)
            reduced_count = sum(int(r["count"]) for r in bucket_counts)

        # ---- schema evolution pre-pass (transactional with this commit) --
        from pyspark.sql import types as T

        table_schema = T.StructType.fromJson(snap["schema"])
        batch_stored_schema = T.StructType(
            [f for f in reduced.schema.fields if f.name in stored_cols]
        )
        merged_schema, changes = merge_schemas(table_schema, batch_stored_schema)

        have = {f.name: f for f in reduced.schema.fields}
        src_cols = []
        for f in merged_schema.fields:
            if f.name == DELETED_COL:
                # tombstone marker derives from the op, not from alignment
                src_cols.append(
                    (F.col(op_col) == "delete").alias(DELETED_COL)
                )
            elif f.name in have:
                c = F.col(f.name)
                src_cols.append(
                    c.cast(f.dataType).alias(f.name)
                    if have[f.name].dataType != f.dataType else c
                )
            else:
                src_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        # bucket id rides through the LWW reduce (constant per key)
        src = reduced.select(*src_cols, F.col(BUCKET_COL))

        out_names = [f.name for f in merged_schema.fields]

        mode = merge_mode
        if mode not in ("auto", "cow", "delta"):
            raise ValueError(f"merge_mode must be auto|cow|delta, got {mode!r}")
        stored_version_cols = snap.get("version_cols")
        if mode != "cow" and stored_version_cols \
                and list(version_cols) != list(stored_version_cols):
            # read-time LWW merges on the TABLE's version columns; a delta
            # written under different ones would merge wrong — CoW instead
            mode = "cow"
        if mode == "auto":
            base_rows = table.base_row_count()
            if lineage_level == "full":
                est = total_read - total_dropped  # live rows ≥ winners
            elif reduced_count is not None:
                est = reduced_count  # from the touched-buckets job above
            else:
                est = None
            if base_rows and est is not None and est < delta_fraction * base_rows:
                mode = "delta"
            else:
                mode = "cow"

        if not table.existing_bucket_paths(touched):
            # no target data in any touched bucket: pure upsert, no join.
            # Deletes still land as tombstones so later stale arrivals lose.
            # applied/deletes counters ride the WRITE job via Observation —
            # no read-back pass over the written parquet.
            up_obs = Observation(f"upsert_b{batch_id}")
            result = src.select(*out_names, BUCKET_COL).observe(
                up_obs,
                F.sum((~F.coalesce(F.col(DELETED_COL), F.lit(False))).cast("long")).alias("applied"),
                F.sum(F.coalesce(F.col(DELETED_COL), F.lit(False)).cast("long")).alias("deletes"),
            )
            new_version = snap["version"] + 1
            rel = table.write_buckets(result, new_version)
            applied = deletes = 0
            try:
                m = up_obs.get
                applied, deletes = int(m["applied"] or 0), int(m["deletes"] or 0)
            except Exception:
                # CollectMetrics folded away (empty/constant plan) — recount
                # in one small pass over the winners-only frame
                row = src.agg(
                    F.sum((~F.coalesce(F.col(DELETED_COL), F.lit(False))).cast("long")),
                    F.sum(F.coalesce(F.col(DELETED_COL), F.lit(False)).cast("long")),
                ).first()
                applied, deletes = int(row[0] or 0), int(row[1] or 0)
            part_rows, new_max_event_ts = _summary_counters(
                pre_obs, part_rows, batch_id, partition_col,
                new_max_event_ts, table, flagged,
            )
            s = _commit(
                table, snap, batch_id, new_wm, part_rows, touched, rel,
                schema_json=merged_schema.jsonValue(), changes=changes,
                applied=applied, deletes=deletes, conflicts=0, t0=t0,
                partition_col=partition_col, max_event_ts=new_max_event_ts,
                version_cols=version_cols, mode="upsert",
                advance_fence=advance_fence,
            )
            s["pre_pass_ms"] = int((t_pre - t0) * 1000)
            return s

        if mode == "delta":
            # ---- MOR-lite: append the winners as per-bucket delta files ----
            # No target read, no join: write cost is O(batch).  The >= version
            # guard is deferred to the read-time LWW reduce (max over the
            # version struct), which resolves base-vs-delta and delta-vs-delta
            # identically to the CoW merge expressions.
            d_obs = Observation(f"delta_b{batch_id}")
            result = src.select(*out_names, BUCKET_COL).observe(
                d_obs,
                F.sum((~F.coalesce(F.col(DELETED_COL), F.lit(False))).cast("long")).alias("applied"),
                F.sum(F.coalesce(F.col(DELETED_COL), F.lit(False)).cast("long")).alias("deletes"),
            )
            new_version = snap["version"] + 1
            rel = table.write_buckets(result, new_version)
            try:
                m = d_obs.get
                applied, deletes = int(m["applied"] or 0), int(m["deletes"] or 0)
            except Exception:
                row = src.agg(
                    F.sum((~F.coalesce(F.col(DELETED_COL), F.lit(False))).cast("long")),
                    F.sum(F.coalesce(F.col(DELETED_COL), F.lit(False)).cast("long")),
                ).first()
                applied, deletes = int(row[0] or 0), int(row[1] or 0)
            part_rows, new_max_event_ts = _summary_counters(
                pre_obs, part_rows, batch_id, partition_col,
                new_max_event_ts, table, flagged,
            )
            s = _commit(
                table, snap, batch_id, new_wm, part_rows,
                table.written_buckets(rel), rel,
                schema_json=merged_schema.jsonValue(), changes=changes,
                applied=applied, deletes=deletes, conflicts=0, t0=t0,
                partition_col=partition_col, max_event_ts=new_max_event_ts,
                version_cols=version_cols, mode="delta",
                advance_fence=advance_fence,
            )
            s["pre_pass_ms"] = int((t_pre - t0) * 1000)
            return s

        obs = Observation(f"merge_b{batch_id}")

        # ---- merge against touched buckets only (copy-on-write) ----------
        tgt = align_to_schema(table.read(buckets=touched, include_tombstones=True),
                              merged_schema)
        tgt = table.bucket_of(tgt).withColumn("__present", F.lit(True))

        s = src.select([F.col(c).alias(f"s_{c}") for c in src.columns])
        t = tgt.select([F.col(c).alias(f"t_{c}") for c in tgt.columns])
        cond = [s[f"s_{k}"].eqNullSafe(t[f"t_{k}"]) for k in key_cols]
        joined = s.join(t, cond, "full_outer")

        s_ver = F.struct(*[F.col(f"s_{c}") for c in version_cols])
        t_ver = F.struct(*[F.col(f"t_{c}") for c in version_cols])
        s_present = F.col(f"s_{key_cols[0]}").isNotNull()
        t_present = F.col("t___present").isNotNull()
        src_wins = s_present & (~t_present | (s_ver >= t_ver))
        s_deleted = F.coalesce(F.col(f"s_{DELETED_COL}"), F.lit(False))
        t_deleted = F.coalesce(F.col(f"t_{DELETED_COL}"), F.lit(False))

        joined = joined.observe(
            obs,
            F.sum((t_present & s_present & ~src_wins).cast("long")).alias("conflicts"),
            F.sum((src_wins & s_deleted & t_present & ~t_deleted).cast("long")).alias("deletes"),
            F.sum((src_wins & ~s_deleted).cast("long")).alias("applied"),
        )

        out_cols = [
            F.coalesce(
                F.when(src_wins, F.col(f"s_{f.name}")).otherwise(F.col(f"t_{f.name}")),
                F.lit(False),
            ).alias(f.name)
            if f.name == DELETED_COL
            else F.when(src_wins, F.col(f"s_{f.name}")).otherwise(
                F.col(f"t_{f.name}")
            ).alias(f.name)
            for f in merged_schema.fields
        ]
        out_bucket = F.when(src_wins, F.col(f"s_{BUCKET_COL}")).otherwise(
            F.col(f"t_{BUCKET_COL}")
        ).alias(BUCKET_COL)
        result = joined.select(*out_cols, out_bucket)

        new_version = snap["version"] + 1
        rel = table.write_buckets(result, new_version)
        try:
            m = obs.get
        except Exception:
            # CollectMetrics can be optimized away (plan folded to a local
            # relation) — recompute the three counters in one small pass.
            m = joined.agg(
                F.sum((t_present & s_present & ~src_wins).cast("long")).alias("conflicts"),
                F.sum((src_wins & s_deleted & t_present & ~t_deleted).cast("long")).alias("deletes"),
                F.sum((src_wins & ~s_deleted).cast("long")).alias("applied"),
            ).first().asDict()

        part_rows, new_max_event_ts = _summary_counters(
            pre_obs, part_rows, batch_id, partition_col,
            new_max_event_ts, table, flagged,
        )
        s = _commit(
            table, snap, batch_id, new_wm, part_rows, touched, rel,
            schema_json=merged_schema.jsonValue(), changes=changes,
            applied=int(m["applied"] or 0), deletes=int(m["deletes"] or 0),
            conflicts=int(m["conflicts"] or 0), t0=t0,
            partition_col=partition_col, max_event_ts=new_max_event_ts,
            version_cols=version_cols, mode="cow",
            advance_fence=advance_fence,
        )
        s["pre_pass_ms"] = int((t_pre - t0) * 1000)
        return s
    finally:
        if persist:
            persisted.unpersist()
        try:
            if reduced_persisted is not None:
                reduced_persisted.unpersist()
        except NameError:
            pass  # epoch-fenced / metadata-only exits never created it


def _summary_counters(
    pre_obs, part_rows, batch_id, partition_col, new_max_event_ts, table, flagged
):
    """In summary lineage mode, collect the batch-global counters from the
    Observation that rode the merge job, and late-write the quarantine table
    if anything was diverted."""
    if pre_obs is None:
        return part_rows, new_max_event_ts
    try:
        p = pre_obs.get
    except Exception:
        return part_rows, new_max_event_ts
    row = {
        partition_col: -2,  # -2 = all-partitions summary (no per-partition split)
        "min_offset": int(p["min_offset"] or 0),
        "max_offset": int(p["max_offset"] or 0),
        "rows_read": int(p["rows_read"] or 0),
        "below_watermark": int(p["below_watermark"] or 0),
        "invalid_events": int(p["invalid_events"] or 0),
        "late_events": int(p["late_events"] or 0),
    }
    if p.get("max_ts") is not None:
        new_max_event_ts = max(
            x for x in (new_max_event_ts, int(p["max_ts"])) if x is not None
        )
    if row["invalid_events"] or row["late_events"]:
        import os as _os

        from pyspark.sql import functions as _F
        (
            flagged.where(_F.col("__invalid") | _F.col("__late"))
            .drop("__below", BUCKET_COL)
            .write.mode("overwrite")
            .parquet(_os.path.join(table.location, f"quarantine/b{batch_id}"))
        )
    return [row], new_max_event_ts


def _commit(
    table: SnapshotTable,
    snap: dict,
    batch_id: int,
    new_wm: dict,
    part_rows,
    touched,
    data_rel,
    *,
    schema_json,
    changes,
    applied: int,
    deletes: int,
    conflicts: int,
    t0: float,
    partition_col: str,
    max_event_ts: int | None = None,
    version_cols: tuple[str, ...] | None = None,
    mode: str = "cow",
    advance_fence: bool = True,
) -> dict:
    new_version = snap["version"] + 1
    duration_ms = int((time.time() - t0) * 1000)

    def _g(r, k):  # older callers may lack the quarantine counters
        try:
            return int(r[k])
        except (KeyError, ValueError, TypeError):
            return 0

    lineage_rows = [
        (
            batch_id, int(r[partition_col]), int(r["min_offset"]),
            int(r["max_offset"]), int(r["rows_read"]), int(r["below_watermark"]),
            _g(r, "invalid_events"), _g(r, "late_events"),
            None, None, None, duration_ms, ENGINE_REVISION,
        )
        for r in part_rows
    ] + [
        (batch_id, -1, None, None,
         sum(int(r["rows_read"]) for r in part_rows),
         sum(int(r["below_watermark"]) for r in part_rows),
         sum(_g(r, "invalid_events") for r in part_rows),
         sum(_g(r, "late_events") for r in part_rows),
         applied, deletes, conflicts, duration_ms, ENGINE_REVISION)
    ]
    # lineage is tiny (one row per journal partition) — write it driver-side
    # with pyarrow, no Spark job
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # nonce keeps racing writers' lineage dirs disjoint (referenced by
    # path in the snapshot, never parsed by name)
    lineage_rel = f"lineage/v{new_version}-{_uuid.uuid4().hex[:8]}"
    names = [
        "batch_id", "partition", "min_offset", "max_offset", "rows_read",
        "below_watermark", "invalid_events", "late_events", "rows_applied",
        "deletes_applied", "merge_conflicts_resolved", "duration_ms",
        "engine_revision",
    ]
    arrays = {
        n: [r[i] for r in lineage_rows] for i, n in enumerate(names)
    }
    pa_schema = pa.schema(
        [(n, pa.string() if n == "engine_revision" else
          pa.int32() if n == "partition" else pa.int64()) for n in names]
    )
    tbl = pa.table(
        {n: pa.array(arrays[n], type=pa_schema.field(n).type) for n in names},
        schema=pa_schema,
    )
    out_dir = os.path.join(table.location, lineage_rel)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "lineage.parquet"))

    # ---- build + CAS-commit, with commit-time rebase where it is safe ----
    # A DELTA batch's files are independent of the base (read-time LWW
    # resolves order), and a metadata-only commit carries no files at all —
    # for those, losing the version CAS to a concurrent maintenance commit
    # only requires re-pointing the SAME data at the fresh parent (schema
    # re-merged, watermarks/fence taken as per-key max).  CoW/upsert
    # rewrites DO depend on the base they merged against, so they re-raise
    # and the caller recomputes the batch (replay_journal's retry).
    from pyspark.sql import types as _T

    written = (
        table.written_bucket_rows(data_rel)
        if touched is not None and data_rel is not None else None
    )
    parent = snap
    eff_schema = schema_json
    for attempt in range(8):
        new_version = parent["version"] + 1
        new = dict(parent)
        new["version"] = new_version
        new["parent"] = parent["version"]
        new["ts_ms"] = int(time.time() * 1000)
        new["schema"] = eff_schema
        if advance_fence:
            wm = {str(k): int(v) for k, v in new_wm.items()}
            if parent is not snap:
                for k, v in parent.get("watermarks", {}).items():
                    wm[str(k)] = max(int(v), int(wm.get(str(k), -1)))
                new["batch_id"] = max(int(parent.get("batch_id", -1)), batch_id)
            else:
                new["batch_id"] = batch_id
            new["watermarks"] = wm
        # repair mode: fence + watermarks stay EXACTLY the parent's — the
        # data change commits, but nothing is newly marked applied
        lineage_dirs = parent.get("lineage_dirs", []) + [lineage_rel]
        if len(lineage_dirs) > LINEAGE_CONSOLIDATE_AT:
            # one dir per commit makes the snapshot JSON and read_lineage
            # cost O(total batches ever applied) — at 10^10-event scale
            # (~40k batches) that is unbounded hot-path metadata growth.
            # Fold the older dirs into ONE consolidated parquet
            # (driver-side pyarrow; the inputs are one tiny file each).
            # Old dirs stay on disk for older snapshots until
            # expire_snapshots prunes them.
            keep = LINEAGE_CONSOLIDATE_AT // 4
            old_dirs, tail = lineage_dirs[:-keep], lineage_dirs[-keep:]
            consolidated = pa.concat_tables([
                pq.read_table(os.path.join(table.location, d))
                for d in old_dirs
            ])
            crel = f"lineage/c{new_version}-{_uuid.uuid4().hex[:8]}"
            cdir = os.path.join(table.location, crel)
            os.makedirs(cdir, exist_ok=True)
            pq.write_table(consolidated, os.path.join(cdir, "lineage.parquet"))
            lineage_dirs = [crel] + tail
        new["lineage_dirs"] = lineage_dirs
        if max_event_ts is not None:
            new["max_event_ts"] = max(
                int(max_event_ts), int(parent.get("max_event_ts", -1))
            )
        bucket_dirs = dict(parent["bucket_dirs"])
        dir_versions = dict(parent["dir_versions"])
        delta_dirs = {b: list(r) for b, r in parent.get("delta_dirs", {}).items()}
        bucket_rows = dict(parent.get("bucket_rows", {}))
        if written is not None:
            dir_versions[data_rel] = new_version
            if mode == "delta":
                for b in written:
                    delta_dirs.setdefault(b, []).append(data_rel)
            else:
                for b in touched:
                    bucket_dirs[str(b)] = data_rel
                    bucket_rows[str(b)] = written.get(str(b), 0)
                    if mode == "cow":
                        # the CoW merge read base ∪ deltas for these
                        # buckets, so the rewrite folded the deltas in; the
                        # pure-upsert path (mode="upsert") never read them
                        # — they stay live
                        delta_dirs.pop(str(b), None)
        new["bucket_dirs"] = bucket_dirs
        # prune dir_versions to dirs still referenced (bucket pointers +
        # delta chains): keeps the snapshot JSON O(buckets), not O(commits
        # ever made)
        live_dirs = set(bucket_dirs.values()) | {
            r for rels in delta_dirs.values() for r in rels
        }
        if data_rel is not None:
            live_dirs.add(data_rel)
        new["dir_versions"] = {
            d: v for d, v in dir_versions.items() if d in live_dirs
        }
        new["delta_dirs"] = delta_dirs
        new["bucket_rows"] = bucket_rows
        if version_cols is not None and not parent.get("version_cols"):
            # tables created before version_cols were recorded: pin them at
            # the first commit so read-time delta merging knows the LWW order
            new["version_cols"] = list(version_cols)
        if changes:
            new.setdefault("properties", {})
            new["properties"] = dict(
                new["properties"], **{f"schema_changes_v{new_version}": changes}
            )
        try:
            table._commit_snapshot(new)
            break
        except CommitConflictError:
            if attempt == 7:
                raise
            fresh = table.snapshot()
            if (mode == "delta" and data_rel is not None
                    and fresh.get("n_buckets") != snap.get("n_buckets")):
                # a concurrent rebucket() changed the layout: this batch's
                # delta files are bucketed under the OLD n_buckets, so
                # appending them to delta_dirs keyed by stale bucket ids
                # would misroute keys (a key's rebucketed base row and its
                # delta winner would live in different buckets, and
                # lookup() would prune to the wrong one).  The CoW path
                # catches this implicitly via its bucket-pointer
                # comparison; delta must refuse explicitly and let the
                # caller recompute against the new layout.
                raise
            if not (data_rel is None or mode == "delta"):
                # CoW/upsert rewrites merged against snap's base: they can
                # only rebase if every touched bucket is EXACTLY as the
                # merge saw it (same base pointer, same delta chain) — true
                # when racing metadata-only commits (analyze, schema), false
                # when a compactor folded those buckets (its fold holds rows
                # our rewrite lacks); then the caller must recompute.
                sd, fd = snap.get("delta_dirs", {}), fresh.get("delta_dirs", {})
                unchanged = all(
                    fresh["bucket_dirs"].get(str(b)) == snap["bucket_dirs"].get(str(b))
                    and fd.get(str(b), []) == sd.get(str(b), [])
                    for b in (touched or [])
                )
                if not unchanged:
                    raise
            parent = fresh
            if parent["schema"] != snap["schema"]:
                # a concurrent writer evolved the schema: our files are
                # still readable (read-time align/cast), but the committed
                # schema must be the UNION or their columns would vanish
                merged2, _ = merge_schemas(
                    _T.StructType.fromJson(parent["schema"]),
                    _T.StructType.fromJson(schema_json),
                )
                eff_schema = merged2.jsonValue()

    return {
        "batch_id": batch_id,
        "version": new_version,
        "skipped": False,
        "pre_pass_ms": None,  # filled by apply_batch
        "rows_read": sum(int(r["rows_read"]) for r in part_rows),
        "below_watermark": sum(int(r["below_watermark"]) for r in part_rows),
        "rows_applied": applied,
        "deletes_applied": deletes,
        "merge_conflicts_resolved": conflicts,
        "schema_changes": changes,
        "touched_buckets": len(touched or []),
        "merge_mode": mode if data_rel is not None else "metadata_only",
        "data_rel": data_rel,
        "duration_ms": duration_ms,
    }


def sync_changes(
    source: SnapshotTable,
    replica: SnapshotTable | str,
    from_version: int | None = None,
    to_version: int | None = None,
    **apply_kwargs,
) -> dict:
    """Lake→lake incremental sync: consume ``source``'s change data feed
    and apply it to ``replica`` through the same versioned LWW merge the
    ingest path uses — the CDC-out half of the engine (ingest CDC in,
    emit CDC out, chain engines without re-reading whole tables).

    The feed (``source.changes(..., deletes='tombstone')``) is mapped to
    batch events: insert/update images upsert, delete tombstones delete —
    each carrying the SOURCE's version columns, so applying a feed is
    idempotent and replay-safe (stale rows lose the LWW reduce exactly as
    they do on the ingest path).  The replica's consumed-through cursor is
    recorded in its snapshot properties (``sync_source`` /
    ``synced_version``); calling with ``from_version=None`` resumes from
    the cursor, so ``sync_changes(src, dst)`` in a loop is exactly-once
    per range.  Journal-fence machinery (per-partition watermarks) is NOT
    advanced here: feed rows mix offsets from many commits, and the
    replica's convergence guarantee is the version columns, not the fence
    — hence ``enforce_watermark=False``.

    Cost: O(changed buckets) on the source (see ``changes``) plus one
    normal incremental merge on the replica.  Reference analog: the
    pipeline's re-extend of destination blocks
    (`activedata_etl/sinks/s3_bucket.py:92-118`), minus the re-read.
    """
    snap = source.snapshot()
    if isinstance(replica, str):
        spark = source.spark
        if SnapshotTable.exists(spark, replica):
            replica = SnapshotTable(spark, replica)
        else:
            replica = SnapshotTable.create(
                spark, replica,
                T.StructType.fromJson(snap["schema"]),
                list(snap["key_cols"]),
                n_buckets=int(snap["n_buckets"]),
                version_cols=list(snap["version_cols"]),
            )
    start = from_version
    props = replica.snapshot().get("properties", {})
    if start is None:
        if props.get("sync_source") not in (None, source.location):
            raise ValueError(
                f"replica {replica.location} tracks {props['sync_source']!r}, "
                f"not {source.location!r} — pass from_version explicitly"
            )
        start = int(props.get("synced_version", 0))
    v_to = source.current_version() if to_version is None else to_version
    if start >= v_to:
        return {"applied": 0, "deletes": 0, "batches": 0,
                "synced_version": start}
    cb = source.changed_buckets(start, v_to)
    if cb is not None and not cb:
        # pure-metadata source range (property commits — e.g. the source's
        # own es-export cursor): a free driver-side check.  Applying the
        # empty feed would mint a replica commit (and grow its snapshot
        # chain) on EVERY poll; skip the apply but do advance the replica's
        # cursor so the metadata commits are not re-diffed next poll — the
        # cursor write is one replica metadata commit per *source* version
        # observed, not per poll.
        replica.set_properties(sync_source=source.location,
                               synced_version=v_to)
        return {"applied": 0, "deletes": 0, "batches": 0,
                "synced_version": v_to}
    feed = source.changes(start, v_to, deletes="tombstone")
    events = feed.withColumn(
        "op",
        F.when(F.col(SnapshotTable.CHANGE_TYPE_COL) == "delete",
               F.lit("delete")).otherwise(F.lit("update")),
    ).drop(SnapshotTable.CHANGE_TYPE_COL, "_from_version", "_to_version")
    # the stored table dropped the journal envelope (ENVELOPE_DROP); the
    # merge wants a partition column for its per-partition accounting only
    # — the fence is not advanced here, so a constant is correct
    if "partition" not in events.columns:
        events = events.withColumn("partition", F.lit(0))
    kwargs = dict(
        version_cols=tuple(snap["version_cols"]),
        validate_cols=tuple(snap["key_cols"]),
        enforce_watermark=False,
        lineage_level="summary",
    )
    kwargs.update(apply_kwargs)
    s = apply_batch(replica, events, replica.last_batch_id() + 1, **kwargs)
    replica.set_properties(sync_source=source.location, synced_version=v_to)
    return {"applied": s["rows_applied"], "deletes": s["deletes_applied"],
            "batches": 1, "synced_version": v_to}
