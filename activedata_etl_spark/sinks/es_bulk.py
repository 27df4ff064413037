"""ES `_bulk` NDJSON formatter — the wire format of the reference's LWW sink.

The reference pushes documents with `_bulk` bodies of alternating action and
source lines: `{"index": {"_id": id, "version": v, "version_type":
"external_gte"}}` then the document JSON
(`vendor/pyLibrary/env/elasticsearch.py:314-335` `_data_bytes`; id/version
extraction `get_encoder` :1434-1463).  This sandbox has no network/ES, so the
sink renders the exact bulk payload distributively (pure Catalyst `to_json` —
no Python) and writes it as text part-files, one batch of ``batch_size``
action/source pairs per output line group — a real deployment POSTs each
part to `/_bulk` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_version_scale(max_second: int) -> int:
    """Smallest power of 10 strictly greater than ``max_second``, floored
    at 1e6 (the historical default, so small journals keep stable versions
    and existing indexes stay comparable).

    Changing scale between exports is SAFE for `external_gte` as long as
    the scale never shrinks: with s2 >= s1 and the second component always
    < its scale, cs2 > cs1 implies cs2*s2 + off2 > cs1*s1 + off1, and
    within one commit_seq a larger offset still wins — versions stay
    monotone per document.  ``export_changes`` persists the scale it used
    in the table properties and takes the max, enforcing never-shrink.
    """
    s = 1_000_000
    m = int(max_second)
    while m >= s:
        s *= 10
    return s


def _resolve_scale(
    df: DataFrame, version_cols: tuple[str, ...], version_scale: int | None
) -> int:
    """An explicit scale passes through (the overflow guard still fires if
    it is too small); ``None`` sizes it from the data — one column-pruned
    max() over the frame (parquet row-group stats make this metadata-ish),
    instead of asking the operator to know the journal's offset invariant."""
    if version_scale is not None:
        return int(version_scale)
    if len(version_cols) < 2:
        return 1_000_000  # unused: single-component versions never collapse
    mx = df.agg(
        F.max(F.col(version_cols[1]).cast("long")).alias("m")
    ).first()["m"]
    return auto_version_scale(mx or 0)


def bulk_action_lines(
    df: DataFrame,
    *,
    id_cols: tuple[str, ...] = ("repo", "path"),
    version_cols: tuple[str, ...] = ("commit_seq", "offset"),
    version_scale: int = 1_000_000,
) -> DataFrame:
    """One output row per document: (action_line, source_line).

    - `_id` is the key rendered as JSON (the reference builds ids by joining
      key parts, `get_encoder` elasticsearch.py:1434-1463 — but a plain
      ':'-join collides: concat_ws silently skips null parts and the
      delimiter may appear inside a part; JSON escaping is unambiguous).
      Null key fields are RENDERED (``ignoreNullFields=false``) so every id
      carries every key column — ids differing only by WHICH column is null
      stay distinct and readable.  FORMAT BREAK: ids produced by the
      pre-round-3 ':'-join scheme (and round-3's null-dropping to_json) do
      not match; an index exported under an old scheme will receive every
      doc again under new ids — re-create the index or delete-by-query the
      old export before switching;
    - `version` must be a single monotone int for `external_gte`: the
      version tuple is collapsed as ``first * scale + second``.  The
      collapse is only monotone while ``second < version_scale``, so rows
      violating it raise instead of silently writing a version that ES
      would judge stale.  The default scale is FIXED at 1_000_000: a
      standalone render has no persisted state, so a data-sized scale
      could legally SHRINK between two exports to the same index and a
      genuinely newer doc would collapse to a lower version than one
      already indexed — silently rejected by external_gte.  Offsets past
      the fixed scale raise loudly; pass an explicit larger scale (and
      keep it stable for that index), or use ``export_changes``, whose
      snapshot-persisted max makes auto-sizing monotone.
    """
    version_scale = _resolve_scale(df, version_cols, version_scale)
    _id, version = _id_and_version(id_cols, version_cols, version_scale)
    action = F.to_json(
        F.struct(
            F.struct(
                _id.alias("_id"),
                version.alias("version"),
                F.lit("external_gte").alias("version_type"),
            ).alias("index")
        )
    )
    payload_cols = [c for c in df.columns]
    source = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    return df.select(action.alias("action_line"), source.alias("source_line"))


def _id_and_version(
    id_cols: tuple[str, ...],
    version_cols: tuple[str, ...],
    version_scale: int,
) -> tuple[F.Column, F.Column]:
    """The collision-free `_id` and monotone `version` expressions shared by
    index and delete actions (see `bulk_action_lines` for the rationale)."""
    _id = F.to_json(
        F.struct(*[F.col(c) for c in id_cols]),
        {"ignoreNullFields": "false"},
    )

    def _required(col, name):
        # a null version renders as a MISSING "version" field (to_json drops
        # nulls) and ES rejects the item at POST time, far from here — fail
        # at render time with the offending column named
        return F.when(col.isNotNull(), col).otherwise(
            F.raise_error(F.lit(
                f"es_bulk: null version component {name!r}; every doc needs "
                "a version for external_gte"
            ))
        )

    if len(version_cols) == 1:
        version = _required(
            F.col(version_cols[0]).cast("long"), version_cols[0]
        )
    else:
        # a missing second component is the LOWEST tiebreak (0), not an
        # overflow: null < scale is NULL and would fire the raise branch
        # with a misleading message, killing the export for one bad row
        second = F.coalesce(F.col(version_cols[1]).cast("long"), F.lit(0))
        first = _required(F.col(version_cols[0]).cast("long"), version_cols[0])
        version = F.when(
            second < F.lit(version_scale),
            first * version_scale + second,
        ).otherwise(
            F.raise_error(F.concat(
                F.lit(f"es_bulk version overflow: {version_cols[1]}="),
                second.cast("string"),
                F.lit(f" >= version_scale={version_scale}; raise version_scale"),
            ))
        )
    return _id, version


def change_bulk_lines(
    feed: DataFrame,
    *,
    id_cols: tuple[str, ...] = ("repo", "path"),
    version_cols: tuple[str, ...] = ("commit_seq", "offset"),
    version_scale: int = 1_000_000,
) -> DataFrame:
    """Render a CHANGE FEED (`SnapshotTable.changes(..., deletes='tombstone')`)
    as `_bulk` lines: insert/update rows become versioned `index`
    action+source pairs, delete rows become versioned `delete` actions (no
    source line — `source_line` is null).  The tombstone feed carries the
    DELETE's own version columns, so a replayed range re-sends byte-identical
    actions and `external_gte` makes the POST idempotent — deletes included.
    The default scale is FIXED at 1_000_000 (see ``bulk_action_lines`` —
    a standalone render must not auto-size); ``export_changes`` passes its
    snapshot-persisted, never-shrinking scale explicitly.
    """
    version_scale = _resolve_scale(feed, version_cols, version_scale)
    _id, version = _id_and_version(id_cols, version_cols, version_scale)
    meta = F.struct(
        _id.alias("_id"),
        version.alias("version"),
        F.lit("external_gte").alias("version_type"),
    )
    is_del = F.col("_change_type") == "delete"
    action = F.when(
        is_del, F.to_json(F.struct(meta.alias("delete")))
    ).otherwise(F.to_json(F.struct(meta.alias("index"))))
    payload_cols = [
        c for c in feed.columns
        if c not in ("_change_type", "_from_version", "_to_version")
    ]
    source = F.when(
        is_del, F.lit(None).cast("string")
    ).otherwise(F.to_json(F.struct(*[F.col(c) for c in payload_cols])))
    return feed.select(
        action.alias("action_line"), source.alias("source_line")
    )


def export_changes(
    source,
    out_dir: str,
    *,
    cursor_name: str = "es",
    from_version: int | None = None,
    to_version: int | None = None,
    id_cols: tuple[str, ...] | None = None,
    version_cols: tuple[str, ...] | None = None,
    version_scale: int | None = None,
    batch_size: int = 5000,
) -> dict:
    """Incremental, resumable ES export: consume ``source``'s change data
    feed since the last export and render POST-able `_bulk` part-files —
    the reference's `push_to_es` loop (`activedata_etl/push_to_es.py`)
    re-expressed over CDC instead of re-reading whole blocks.

    The consumed-through cursor lives in the source's snapshot properties
    (``es_export_<cursor_name>``, a metadata-only CAS commit), so calling
    in a loop exports each range exactly once per destination; the range is
    also the output subdirectory (``v<from>_to_<to>``), so a crashed export
    re-run OVERWRITES its own partial files before the cursor moves —
    idempotent end-to-end, and `external_gte` absorbs double-POSTs.  Cost
    is O(changed buckets), not O(table) (see ``SnapshotTable.changes``).
    """
    import os

    snap = source.snapshot()
    # default the document identity to the table's own key/version metadata
    # — the id under which replicas converge is the id ES should use
    if id_cols is None:
        id_cols = tuple(snap["key_cols"])
    if version_cols is None:
        version_cols = tuple(snap["version_cols"])
    start = from_version
    if start is None:
        start = int(snap.get("properties", {}).get(
            f"es_export_{cursor_name}", 0))
    v_to = source.current_version() if to_version is None else to_version
    if start >= v_to:
        return {"docs": 0, "deletes": 0, "from_version": start,
                "to_version": start, "out": None}
    cb = source.changed_buckets(start, v_to)
    if cb is not None and not cb:
        # pure-metadata range (e.g. only cursor/property commits — the
        # cursor commit below is itself one): a FREE driver-side check.
        # Do NOT move the cursor: a no-op export must not create a commit,
        # or every poll would mint a fresh version and the exporter would
        # chase its own tail forever.
        return {"docs": 0, "deletes": 0, "from_version": start,
                "to_version": start, "out": None}
    feed = source.changes(start, v_to, deletes="tombstone").localCheckpoint()
    counts = {
        r["_change_type"]: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    if not counts:
        # physically-changed range with a row-identical diff (a rebucket or
        # compaction rewrote files without changing content).  ADVANCE the
        # cursor here: leaving it would re-pay this (possibly full-table)
        # diff on every poll.  The cursor commit is metadata-only, so the
        # follow-up range short-circuits on the free check above — no tail
        # chase.
        source.set_properties(**{f"es_export_{cursor_name}": v_to})
        return {"docs": 0, "deletes": 0, "from_version": start,
                "to_version": v_to, "out": None}
    # auto-size the version collapse from THIS range's data, never
    # shrinking below a scale a previous export already used (persisted in
    # the snapshot properties): versions stay monotone per document across
    # exports even as the journal's per-partition offsets grow past any
    # fixed default (auto_version_scale docstring has the proof sketch)
    scale_key = f"es_export_{cursor_name}_scale"
    stored_scale = int(snap.get("properties", {}).get(scale_key, 0))
    eff_scale = max(
        _resolve_scale(feed, version_cols, version_scale), stored_scale
    )
    lines = change_bulk_lines(
        feed, id_cols=id_cols, version_cols=version_cols,
        version_scale=eff_scale,
    )
    # concat_ws deliberately DROPS the null source_line of a delete action —
    # the one place that semantics is exactly right (never use it for ids)
    body = lines.select(
        F.concat_ws("\n", "action_line", "source_line").alias("value")
    )
    out = os.path.join(out_dir, f"v{start}_to_{v_to}")
    (body.write.mode("overwrite")
     .option("maxRecordsPerFile", batch_size).text(out))
    source.set_properties(
        **{f"es_export_{cursor_name}": v_to, scale_key: eff_scale}
    )
    n_del = counts.get("delete", 0)
    return {
        "docs": sum(counts.values()) - n_del,
        "deletes": n_del,
        "from_version": start,
        "to_version": v_to,
        "out": out,
    }


def write_bulk_files(
    df: DataFrame,
    out_dir: str,
    *,
    id_cols: tuple[str, ...] = ("repo", "path"),
    version_cols: tuple[str, ...] = ("commit_seq", "offset"),
    version_scale: int = 1_000_000,
    batch_size: int = 5000,
) -> None:
    """Render `_bulk` bodies as text part-files: alternating action/source
    lines, at most ``batch_size`` docs per POST-able chunk (the reference's
    default batch, `rollover_index.py:45` / push_to_es settings).

    ``maxRecordsPerFile`` enforces the one-file-is-one-POST-able-bulk
    contract EXACTLY (<= batch_size docs per file) in the writer itself —
    no sizing ``count()`` (a full extra input scan) and no repartition
    (hash distribution only approximates per-file counts, so files could
    exceed the batch)."""
    lines = bulk_action_lines(
        df, id_cols=id_cols, version_cols=version_cols,
        version_scale=version_scale,
    )
    body = lines.select(
        F.concat_ws("\n", "action_line", "source_line").alias("value")
    )
    (body.write.mode("overwrite")
     .option("maxRecordsPerFile", batch_size).text(out_dir))
