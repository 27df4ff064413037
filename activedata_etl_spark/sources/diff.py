"""Unified-diff → CDC change events, and line-level diff application.

The reference parses unified diffs into per-file change lists
(`diff_to_json`/`diff_to_moves`, `vendor/mo_hg/parse.py:35-174`) and applies
them to keyed line state (`apply_diff`/`apply_diff_backwards`,
`vendor/mo_hg/apply.py:85-161`): '+'/'-' actions carry the running NEW-side
line cursor, renames change the key, `dev/null` means delete.

Spark-first shape: parsing is an Arrow-batched ``mapInPandas`` over a
DataFrame of raw diff texts (one Python invocation per batch — a parser is
inherently Python, as in the reference, but it is never row-at-a-time
through the serializer), emitting one CDC event row per touched file.  The
emitted rows feed the same journal → LWW → MERGE pipeline as every other
change source.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HUNK_HEADER = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")
FILE_SEP = re.compile(r"^diff --git ", re.MULTILINE)
DEV_NULL = "dev/null"

CHANGE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("line", T.IntegerType()),     # 0-based new-side cursor
            T.StructField("action", T.StringType()),    # '+' or '-'
            T.StructField("content", T.StringType()),
        ]
    )
)

DIFF_EVENT_FIELDS = [
    T.StructField("old_path", T.StringType()),
    T.StructField("new_path", T.StringType()),
    T.StructField("op", T.StringType()),  # insert|update|delete|rename
    T.StructField("n_added", T.IntegerType()),
    T.StructField("n_removed", T.IntegerType()),
    T.StructField("changes", CHANGE_TYPE),
]

_SKIP_PREFIXES = ("new file mode", "deleted file mode", "index ",
                  "GIT binary patch", "literal ", "Binary file")


def parse_unified_diff(diff_text: str) -> list[dict]:
    """One unified diff -> per-file change dicts (pure python, testable)."""
    out = []
    for file_block in FILE_SEP.split(diff_text)[1:]:
        lines = file_block.split("\n")
        # header line: "a/<old> b/<new>"
        m = re.match(r"a/(\S+) b/(\S+)", lines[0])
        if not m:
            continue
        old_path, new_path = m.group(1), m.group(2)
        changes = []
        new_i = old_i = 0
        in_hunk = False
        new_file = deleted_file = False
        for ln in lines[1:]:
            h = HUNK_HEADER.match(ln)
            if h:
                old_i = max(0, int(h.group(1)) - 1)
                new_i = max(0, int(h.group(3)) - 1)
                in_hunk = True
                continue
            if not in_hunk:
                if ln.startswith("new file mode"):
                    new_file = True
                elif ln.startswith("deleted file mode"):
                    deleted_file = True
                elif ln.startswith("--- "):
                    if ln[4:].lstrip("ab/") == DEV_NULL or ln[4:] == "/dev/null":
                        new_file = True
                elif ln.startswith("+++ "):
                    if ln[4:].lstrip("ab/") == DEV_NULL or ln[4:] == "/dev/null":
                        deleted_file = True
                continue
            if not ln:
                # an empty line INSIDE a hunk is an empty context line whose
                # leading ' ' was stripped in transit (mail clients/editors
                # trim trailing whitespace); skipping it without advancing
                # the cursors would shift every later change in the hunk
                new_i += 1
                old_i += 1
                continue
            if any(ln.startswith(p) for p in _SKIP_PREFIXES):
                in_hunk = False
                continue
            d = ln[0]
            if d == "+":
                changes.append({"line": new_i, "action": "+", "content": ln[1:]})
                new_i += 1
            elif d == "-":
                changes.append({"line": new_i, "action": "-", "content": ln[1:]})
                old_i += 1
            elif d == " " or d == "\\":  # context / "\ No newline" marker
                if d == " ":
                    new_i += 1
                    old_i += 1
        if deleted_file or new_path == DEV_NULL:
            op = "delete"
        elif new_file or old_path == DEV_NULL:
            op = "insert"
        elif old_path != new_path:
            op = "rename"
        else:
            op = "update"
        out.append(
            {
                "old_path": old_path,
                "new_path": new_path,
                "op": op,
                "n_added": sum(1 for c in changes if c["action"] == "+"),
                "n_removed": sum(1 for c in changes if c["action"] == "-"),
                "changes": changes,
            }
        )
    return out


def diff_to_events(
    df: DataFrame, *, diff_col: str = "diff", carry_cols: tuple[str, ...] = ("repo", "commit")
) -> DataFrame:
    """(repo, commit, diff_text) rows -> one change-event row per touched
    file, ready for the journal -> LWW -> MERGE pipeline."""
    carry_fields = [df.schema[c] for c in carry_cols]
    out_schema = T.StructType(carry_fields + DIFF_EVENT_FIELDS)
    carry = list(carry_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                for ev in parse_unified_diff(rec[diff_col] or ""):
                    rows.append({**{c: rec[c] for c in carry}, **ev})
            yield pd.DataFrame(rows, columns=carry + [f.name for f in DIFF_EVENT_FIELDS])

    return df.mapInPandas(run, out_schema)


def apply_changes(content: str | None, changes: list[dict]) -> str:
    """Apply '+'/'-' actions (new-side 0-based cursors, in diff order) to a
    file's text — the `apply_diff` line algebra on real content."""
    lines = [] if content is None or content == "" else content.split("\n")
    for ch in changes:
        i = int(ch["line"])
        if ch["action"] == "+":
            lines.insert(i, ch["content"])
        else:
            del lines[i]
    return "\n".join(lines)


def reverse_changes(changes: list[dict]) -> list[dict]:
    """Flip '+' <-> '-' and reverse order (`apply_diff_backwards` analog);
    applying the result to the new content restores the old content."""
    flip = {"+": "-", "-": "+"}
    return [
        {**c, "action": flip[c["action"]]} for c in reversed(list(changes))
    ]


def apply_changes_udf():
    """Arrow UDF: (content, changes) -> new content, batch-vectorized."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _apply(content: pd.Series, changes: pd.Series) -> pd.Series:
        return pd.Series(
            [
                apply_changes(c, list(ch) if ch is not None else [])
                for c, ch in zip(content, changes)
            ]
        )

    return _apply
