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
      would judge stale (size ``version_scale`` to the journal: e.g. max
      offsets per commit_seq).
    """
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


def write_bulk_files(
    df: DataFrame,
    out_dir: str,
    *,
    id_cols: tuple[str, ...] = ("repo", "path"),
    version_cols: tuple[str, ...] = ("commit_seq", "offset"),
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
    lines = bulk_action_lines(df, id_cols=id_cols, version_cols=version_cols)
    body = lines.select(
        F.concat_ws("\n", "action_line", "source_line").alias("value")
    )
    (body.write.mode("overwrite")
     .option("maxRecordsPerFile", batch_size).text(out_dir))
