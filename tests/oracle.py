"""Independent pandas oracle for the CDC replay.

Single-threaded, in-order reduce over the journal — deliberately NOT sharing
code with the engine (own extension map, own hashing via hashlib), the analog
of the reference's golden-fixture comparisons
(`/root/reference/tests/test_gcov.py:26-40`, FuzzyTestCase).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

_LANGS = {
    "py": "python", "js": "javascript", "cpp": "cpp", "h": "cpp",
    "rs": "rust", "java": "java", "md": "markdown", "json": "json",
    "yml": "yaml", "yaml": "yaml", "c": "c", "ts": "typescript",
    "go": "go", "html": "html", "css": "css", "sh": "shell", "txt": "text",
}


def _lang(path: str) -> str | None:
    m = re.search(r"\.([A-Za-z0-9]+)$", path)
    return _LANGS.get(m.group(1).lower()) if m else None


def _sha256(s) -> str | None:
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return None
    return hashlib.sha256(str(s).encode("utf-8")).hexdigest()


def oracle_state(journal: pd.DataFrame) -> pd.DataFrame:
    """Converged table: last writer per (repo, path) by (commit_seq, offset);
    deletes drop the key.  Returns repo,path,commit,lang,content,content_sha256."""
    df = journal.drop_duplicates(subset=["partition", "offset"]).copy()
    df = df.sort_values(["commit_seq", "offset"], kind="mergesort")
    last = df.groupby(["repo", "path"], as_index=False).tail(1)
    live = last[last["op"] != "delete"].copy()
    live["lang"] = live["path"].map(_lang)
    live["content_sha256"] = live["content"].map(_sha256)
    cols = ["repo", "path", "commit", "lang", "content", "content_sha256"]
    return (
        live[cols]
        .sort_values(["repo", "path"], kind="mergesort")
        .reset_index(drop=True)
    )


def assert_table_matches_oracle(table_df, journal_pdf: pd.DataFrame) -> None:
    """Byte-level comparison: per-row sha256(content) + all key columns."""
    got = (
        table_df.select("repo", "path", "commit", "lang", "content", "content_sha256")
        .toPandas()
        .sort_values(["repo", "path"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = oracle_state(journal_pdf)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
