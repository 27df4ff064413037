"""Deterministic sharded JSON-lines export — the training-data handoff sink.

The reference hands processed documents to downstream consumers as
line-oriented JSON blocks in object storage (gzip JSON-lines written per
ETL block, `activedata_etl/etl.py` sink chain + the `key.json.gz` S3
layout the sources re-read) — the same contract an LLM training pipeline
expects: a FIXED number of content-addressed `.jsonl(.gz)` shards whose
membership and line order do not depend on cluster size, task scheduling,
or input partitioning, plus a manifest to audit counts before a run.

Spark-first shape (no Python in the row path):

- shard id = mix31-permuted residue of the document id (the SAME
  deterministic hash family as ``operators/sampling.py`` — so shard
  assignment is reproducible in plain SQL, string/UUID ids included);
- the whole row renders to ONE ``to_json(struct(...))`` line (Catalyst,
  codegen'd), so the export job shuffles exactly the bytes it writes;
- one ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` puts
  every shard in a deterministic order inside its own ``shard=K/``
  directory (``partitionBy``), one file per shard per writing task that
  holds it — re-running the export yields byte-identical decompressed
  shard contents;
- the manifest (per-shard rows + exact uncompressed bytes) is ONE extra
  partial-agg pass over the rendered column, written driver-side as a
  single small JSON file.

At 100 TB: the export is one shuffle sized by ``n_shards`` (pick shards
~ a few hundred MB compressed, the usual training-shard size); the
manifest agg is map-side combinable to ``n_shards`` rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from activedata_etl_spark.operators.dedup import MIX_P, mix_consts
from activedata_etl_spark.operators.sampling import _id_residue


def shard_column(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    *,
    id_hash: str = "auto",
    seed: int = 0x5EED,
):
    """Deterministic shard id in ``[0, n_shards)`` for each row — the
    mix31 permutation of the id residue (uniform, content-addressed,
    SQL-reproducible), NOT Spark's task-dependent partition id."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ((a, c),) = mix_consts(seed, 1)
    u = (_id_residue(df, id_col, id_hash=id_hash) * a + c) % MIX_P
    return (u % F.lit(n_shards)).cast("int")


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    order_cols: list[str] | None = None,
    compress: bool = True,
    id_hash: str = "auto",
    seed: int = 0x5EED,
) -> list[dict]:
    """Write ``df`` as ``n_shards`` deterministic JSON-lines shards under
    ``path/data/shard=K/`` and a ``path/manifest.json``; returns the
    manifest (list of ``{"shard", "n_rows", "n_bytes"}``, all shards
    present including empty ones, ``n_bytes`` = exact uncompressed line
    bytes incl. newlines).

    Line order inside a shard is ``order_cols`` (default: the id), so two
    exports of the same frame produce identical decompressed shards —
    regardless of input partitioning or cluster size.  Null ids are
    rejected loudly (a silent hash-of-null shard would corrupt the
    content-addressing contract).
    """
    order = list(order_cols) if order_cols else [id_col]
    rendered = (
        df.withColumn(
            "__shard",
            shard_column(df, id_col, n_shards, id_hash=id_hash, seed=seed),
        )
        .withColumn(
            "__line", F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
    )
    bad = rendered.where(F.col(id_col).isNull()).limit(1).count()
    if bad:
        raise ValueError(f"null {id_col!r}: every exported row needs an id")

    counts = {
        r["__shard"]: (r["n_rows"], r["n_bytes"])
        for r in rendered.groupBy("__shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # +1: the newline the text writer appends per line
            F.sum(F.octet_length("__line") + F.lit(1)).alias("n_bytes"),
        )
        .collect()  # driver-sized: exactly n_shards rows
    }
    writer = (
        rendered.select("__shard", *order, "__line")
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", *order)
        .select(
            F.col("__shard").alias("shard"), F.col("__line").alias("value")
        )
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(os.path.join(path, "data"))

    manifest = [
        {
            "shard": s,
            "n_rows": int(counts.get(s, (0, 0))[0]),
            "n_bytes": int(counts.get(s, (0, 0))[1] or 0),
        }
        for s in range(n_shards)
    ]
    _write_manifest(path, n_shards, id_col, compress, manifest)
    return manifest


def _write_manifest(path, n_shards, id_col, compress, manifest):
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "n_shards": n_shards,
                "id_col": id_col,
                "compressed": compress,
                "total_rows": sum(m["n_rows"] for m in manifest),
                "shards": manifest,
            },
            f,
            indent=1,
        )
    os.replace(tmp, os.path.join(path, "manifest.json"))


def export_jsonl_changes(
    source,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    cursor_name: str = "jsonl",
    order_cols: list[str] | None = None,
    compress: bool = True,
    id_hash: str = "auto",
    seed: int = 0x5EED,
) -> dict:
    """Incremental shard publishing over the lake's change data feed:
    re-materialize ONLY the shards containing keys that changed since the
    last export, leaving every other shard file untouched byte-for-byte.

    Because shard membership is content-addressed (a pure function of the
    id), a changed key maps to exactly one shard; the feed costs
    O(changed buckets) (`SnapshotTable.changes`), the changed-shard set is
    driver-sized (<= n_shards), and the rewrite scans the current table
    once with a shard filter but WRITES only O(changed shards).  Deletes
    fall out naturally: a rewritten shard is rebuilt from the CURRENT
    table, so vanished keys vanish from their shard (a shard emptied
    entirely is rewritten to empty).  The result is always byte-identical
    (decompressed) to a fresh full export of the current version.

    The consumed-through cursor and the sharding config (n_shards, seed,
    id_hash) persist in the source's snapshot properties
    (``jsonl_export_<cursor_name>``, metadata-only CAS commit — same
    discipline as the ES exporter): polling in a loop exports each range
    exactly once, and a config drift between calls fails loudly (shards
    written under two configs would never be consistent).  The first call
    performs the full export and records the config.
    """
    cur_key = f"jsonl_export_{cursor_name}"
    cfg_key = f"jsonl_export_{cursor_name}_cfg"
    snap = source.snapshot()
    props = snap.get("properties", {})
    cfg = {"n_shards": n_shards, "seed": seed, "id_hash": id_hash,
           "id_col": id_col}
    stored_cfg = props.get(cfg_key)
    if stored_cfg is not None and json.loads(stored_cfg) != cfg:
        raise ValueError(
            f"jsonl export config drift for cursor {cursor_name!r}: "
            f"stored {stored_cfg} vs requested {json.dumps(cfg)} — use a "
            "new cursor/path or re-export in full with the old config"
        )
    start = int(props.get(cur_key, 0))
    v_to = source.current_version()
    if start == 0:
        manifest = export_jsonl_shards(
            source.read(), path, id_col=id_col, n_shards=n_shards,
            order_cols=order_cols, compress=compress, id_hash=id_hash,
            seed=seed,
        )
        source.set_properties(**{cur_key: v_to, cfg_key: json.dumps(cfg)})
        return {"from_version": 0, "to_version": v_to, "full": True,
                "shards_rewritten": n_shards,
                "rows": sum(m["n_rows"] for m in manifest)}
    if start >= v_to:
        return {"from_version": start, "to_version": start, "full": False,
                "shards_rewritten": 0, "rows": 0}
    cb = source.changed_buckets(start, v_to)
    if cb is not None and not cb:
        # pure-metadata range: free driver-side no-op, cursor stays (the
        # next real range subsumes this one; see es_bulk.export_changes)
        return {"from_version": start, "to_version": start, "full": False,
                "shards_rewritten": 0, "rows": 0}
    feed = source.changes(start, v_to)
    if feed.where(F.col(id_col).isNull()).limit(1).count():
        raise ValueError(
            f"null {id_col!r} in the change feed: every exported row "
            "needs an id (content-addressed shards cannot place it)"
        )
    keys = feed.select(F.col(id_col))
    changed = sorted(
        r["s"] for r in keys.select(
            shard_column(keys, id_col, n_shards, id_hash=id_hash, seed=seed)
            .alias("s")
        ).distinct().collect()  # driver-sized: <= n_shards
    )
    if not changed:
        # row-identical physical change (compaction/rebucket): advance the
        # cursor so the (possibly full-table) diff is never re-paid
        source.set_properties(**{cur_key: v_to})
        return {"from_version": start, "to_version": v_to, "full": False,
                "shards_rewritten": 0, "rows": 0}

    df = source.read()
    order = list(order_cols) if order_cols else [id_col]
    rendered = (
        df.withColumn(
            "__shard",
            shard_column(df, id_col, n_shards, id_hash=id_hash, seed=seed),
        )
        .where(F.col("__shard").isin(changed))
        .withColumn(
            "__line", F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
    )
    counts = {
        r["__shard"]: (r["n_rows"], r["n_bytes"])
        for r in rendered.groupBy("__shard").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.octet_length("__line") + F.lit(1)).alias("n_bytes"),
        ).collect()
    }
    writer = (
        rendered.select("__shard", *order, "__line")
        .repartition(len(changed), "__shard")
        .sortWithinPartitions("__shard", *order)
        .select(
            F.col("__shard").alias("shard"), F.col("__line").alias("value")
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        # rewrite ONLY the shard partitions present in this frame
        .option("partitionOverwriteMode", "dynamic")
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(os.path.join(path, "data"))
    # a shard whose every key was deleted has no rows in the frame, so
    # dynamic overwrite leaves its stale files — empty it explicitly
    for s in changed:
        if s not in counts:
            d = os.path.join(path, "data", f"shard={s}")
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    os.remove(os.path.join(d, fn))

    with open(os.path.join(path, "manifest.json")) as f:
        man = json.load(f)
    shards = man["shards"]
    rows = 0
    for s in changed:
        n, b = counts.get(s, (0, 0))
        shards[s] = {"shard": s, "n_rows": int(n), "n_bytes": int(b or 0)}
        rows += int(n)
    _write_manifest(path, n_shards, id_col, compress, shards)
    source.set_properties(**{cur_key: v_to, cfg_key: json.dumps(cfg)})
    return {"from_version": start, "to_version": v_to, "full": False,
            "shards_rewritten": len(changed), "rows": rows}
