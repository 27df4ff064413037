"""Maintenance ops (update/delete where), backfill range, split sink,
JSON-lines sources, q21 oracle parity."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from pyspark.sql import functions as F

from activedata_etl_spark.journal import read_journal, write_journal
from activedata_etl_spark.lake.merge import apply_batch
from activedata_etl_spark.lake.table import SnapshotTable
from activedata_etl_spark.streaming.replay import ensure_table, replay_journal

COLS = (
    "partition int, offset long, commit_seq long, op string, repo string, "
    "path string, commit string, lang string, content string, ts timestamp"
)


def _mk_table(spark, tmp_path, rows, name):
    from activedata_etl_spark.functions.normalize import normalize_batch

    df = spark.createDataFrame(rows, COLS)
    t = ensure_table(spark, str(tmp_path / name), df.schema)
    apply_batch(t, normalize_batch(df), 0)
    return t


def test_update_where(spark, tmp_path):
    t = _mk_table(spark, tmp_path, [
        (0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", None),
        (0, 1, 1, "insert", "r", "b.js", "d" * 12, None, "Y", None),
    ], "t_upd")
    t.update_where("path = 'a.py'", {"content": F.lit("PATCHED")})
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"a.py": "PATCHED", "b.js": "Y"}


def test_delete_where(spark, tmp_path):
    t = _mk_table(spark, tmp_path, [
        (0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", None),
        (0, 1, 1, "insert", "r", "b.js", "d" * 12, None, "Y", None),
    ], "t_del")
    t.delete_where("lang = 'python'")
    assert [r["path"] for r in t.read().collect()] == ["b.js"]


def test_backfill_offset_range(spark, tmp_path):
    jd = str(tmp_path / "j")
    write_journal(spark, 2048, jd)
    loc = str(tmp_path / "lake_bf")
    r = replay_journal(spark, jd, loc, chunk_events=512, offset_range=(0, 1023))
    assert r["batches"] == 2
    wm = SnapshotTable(spark, loc).watermarks()
    assert max(wm.values()) <= 1023


def test_backfill_forward_gap_rejected_catchup_converges(spark, tmp_path):
    """The batch fence and watermarks are CONTIGUOUS frontiers, so a backfill
    range that would leave a gap below it is rejected loudly (silently
    committing past the gap would fence those events out of every later
    replay); a bounded prefix + catch-up converges to the full replay."""
    import pytest

    jd = str(tmp_path / "j")
    write_journal(spark, 2048, jd)
    loc_full = str(tmp_path / "full")
    replay_journal(spark, jd, loc_full, chunk_events=512)
    want = {
        (r["repo"], r["path"], r["content_sha256"])
        for r in SnapshotTable(spark, loc_full).read()
        .select("repo", "path", "content_sha256").collect()
    }
    # a tail range on a fresh table = forward gap -> loud error, no commits
    loc = str(tmp_path / "bf")
    with pytest.raises(ValueError, match="forward gap"):
        replay_journal(spark, jd, loc, chunk_events=512,
                       offset_range=(1024, 2047))
    # legit: bounded prefix, then an extension from the frontier, then full
    r1 = replay_journal(spark, jd, loc, chunk_events=512, offset_range=(0, 1023))
    assert r1["batches"] == 2
    # a mid-chunk UPPER bound would commit a partially-applied chunk ->
    # its tail would be fenced out of every later replay: reject loudly
    with pytest.raises(ValueError, match="partially-applied"):
        replay_journal(spark, jd, loc, chunk_events=512,
                       offset_range=(1024, 1500))
    r2 = replay_journal(spark, jd, loc, chunk_events=512,
                        offset_range=(1024, 2047))
    assert r2["batches"] == 2  # starts AT chunk 2 - no empty re-commits of 0-1
    got = {
        (r["repo"], r["path"], r["content_sha256"])
        for r in SnapshotTable(spark, loc).read()
        .select("repo", "path", "content_sha256").collect()
    }
    assert got == want


def test_split_sink(spark, tmp_path):
    from activedata_etl_spark.functions.normalize import normalize_batch
    from activedata_etl_spark.streaming.replay import split_sink

    rows = [(0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", None)]
    df = spark.createDataFrame(rows, COLS)
    t1 = ensure_table(spark, str(tmp_path / "s1"), df.schema)
    t2 = ensure_table(spark, str(tmp_path / "s2"), df.schema)
    split_sink([t1, t2])(df, 0)
    assert t1.read().count() == 1 and t2.read().count() == 1
    # replaying the same epoch is fenced on BOTH
    split_sink([t1, t2])(df, 0)
    assert t1.current_version() == t2.current_version()


def test_read_jsonlines_gz(spark, tmp_path):
    from activedata_etl_spark.sources.jsonlines import (
        explode_path,
        parse_json_column,
        read_jsonlines,
    )

    p = tmp_path / "blocks"
    os.makedirs(p)
    with gzip.open(p / "block1.json.gz", "wt") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "tags": [f"t{i}", "x"],
                                "meta": json.dumps({"a": i * 2})}) + "\n")
    df = read_jsonlines(spark, str(p), "id long, tags array<string>, meta string")
    assert df.count() == 10
    parsed = parse_json_column(df, "meta", "a long")
    assert parsed.select(F.sum("parsed.a")).first()[0] == 90
    ex = explode_path(parsed, "tags", "tag")
    assert ex.where(F.col("tag") == "x").count() == 10


def test_q21_matches_duckdb(spark):
    import duckdb

    from activedata_etl_spark.plans.queries import ORACLE_SQL, SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    got = SPARK_QUERIES["q21_json_extract"](spark, sf).toPandas()
    want = con.sql(ORACLE_SQL["q21_json_extract"]).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollover_sink_routing_and_expiry(spark, tmp_path):
    """Time-partition routing + DATA_TOO_OLD rejection + age-based partition
    expiry (vendor/pyLibrary/env/rollover_index.py:69-130)."""
    import datetime as dt

    from activedata_etl_spark.lake.rollover import RolloverSink

    now = dt.datetime(2024, 6, 15)
    sink = RolloverSink(
        spark, str(tmp_path / "roll"), rollover_field="ts",
        rollover_interval="month", rollover_max=dt.timedelta(days=120),
        now=now,
    )
    rows = [
        (1, dt.datetime(2024, 6, 1)),
        (2, dt.datetime(2024, 5, 20)),
        (3, dt.datetime(2024, 3, 1)),    # old but within 120d horizon
        (4, dt.datetime(2023, 1, 1)),    # DATA_TOO_OLD -> rejected
        (5, None),                        # null ts -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    s = sink.write(df)
    assert s["rejected_too_old"] == 1
    assert sink.partitions() == ["20240301_000000", "20240501_000000", "20240601_000000"]
    assert {r["id"] for r in sink.read().collect()} == {1, 2, 3}
    # bounded read prunes partitions
    assert {r["id"] for r in sink.read(since=dt.datetime(2024, 5, 1)).collect()} == {1, 2}

    # boundary read: a since INSIDE a partition keeps that partition's rows
    # at-or-after since (the May 20 row must survive since=May 10)
    assert {r["id"] for r in sink.read(since=dt.datetime(2024, 5, 10)).collect()} == {1, 2}

    # advance the clock: March ages out of the 120-day horizon
    sink._now = dt.datetime(2024, 8, 1)
    removed = sink.expire()
    assert removed == ["20240301_000000"]
    assert {r["id"] for r in sink.read().collect()} == {1, 2}

    # boundary expiry: horizon lands INSIDE May (2024-09-15 - 120d = May 18);
    # the May partition still holds rows younger than the horizon is NOT
    # comparable by its start — whole-partition delete only when its END has
    # passed (May 20 row would be silently destroyed otherwise)
    sink._now = dt.datetime(2024, 9, 15)
    assert sink.expire() == []
    assert {r["id"] for r in sink.read().collect()} == {1, 2}
    sink._now = dt.datetime(2024, 10, 15)   # horizon Jun 17: May fully past
    assert sink.expire() == ["20240501_000000"]
    assert {r["id"] for r in sink.read().collect()} == {1}


def test_rollover_write_is_single_scan(spark, tmp_path):
    """The routed write must be ONE job (Observation rides the live write);
    a second scan happens only when too-old rows need quarantining — the old
    shape (count + quarantine write + live write) was three."""
    import datetime as dt

    from activedata_etl_spark.lake.rollover import RolloverSink

    sink = RolloverSink(
        spark, str(tmp_path / "roll1"), rollover_field="ts",
        rollover_interval="month", rollover_max=dt.timedelta(days=120),
        now=dt.datetime(2024, 6, 15),
    )
    fresh = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1)), (2, dt.datetime(2024, 5, 20))],
        "id long, ts timestamp",
    )
    sc = spark.sparkContext
    sc.setJobGroup("roll_clean", "")
    try:
        s = sink.write(fresh)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert s["rejected_too_old"] == 0
    assert len(sc.statusTracker().getJobIdsForGroup("roll_clean")) == 1

    with_old = spark.createDataFrame(
        [(3, dt.datetime(2024, 6, 2)), (4, dt.datetime(2023, 1, 1))],
        "id long, ts timestamp",
    )
    sc.setJobGroup("roll_old", "")
    try:
        s = sink.write(with_old)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert s["rejected_too_old"] == 1
    assert len(sc.statusTracker().getJobIdsForGroup("roll_old")) == 2
    assert {r["id"] for r in sink.read().collect()} == {1, 2, 3}


def test_bulk_files_respect_batch_contract(spark, tmp_path):
    """Every part file holds <= batch_size docs (one file = one POST-able
    bulk body) with NO sizing count(): 9999 docs at batch 5000 used to land
    in one 9999-doc file via floor division, after a full extra scan.
    The fixed-scale default is also exactly one job (no sizing scan)."""
    import glob

    from activedata_etl_spark.sinks.es_bulk import write_bulk_files

    df = spark.range(9999).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.col("id").alias("commit_seq"),
        F.lit(0).alias("offset"),
    )
    out = str(tmp_path / "bulk9999")
    sc = spark.sparkContext
    sc.setJobGroup("bulk_write", "")
    try:
        write_bulk_files(df, out, batch_size=5000, version_scale=1_000_000)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(sc.statusTracker().getJobIdsForGroup("bulk_write")) == 1
    counts = [
        sum(1 for _ in open(f)) // 2 for f in glob.glob(out + "/part-*")
    ]
    assert sum(counts) == 9999
    assert max(counts) <= 5000
    # default (fixed) scale: same file contract, still exactly one job —
    # standalone renders never auto-size (a data-sized scale could shrink
    # between exports and external_gte would silently reject newer docs)
    out2 = str(tmp_path / "bulk9999_auto")
    sc.setJobGroup("bulk_write_auto", "")
    try:
        write_bulk_files(df, out2, batch_size=5000)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(sc.statusTracker().getJobIdsForGroup("bulk_write_auto")) == 1
    counts2 = [
        sum(1 for _ in open(f)) // 2 for f in glob.glob(out2 + "/part-*")
    ]
    assert sum(counts2) == 9999 and max(counts2) <= 5000


def _git_diff(path_a, path_b, a_text, b_text, extra_header=None):
    import difflib

    body = "\n".join(
        difflib.unified_diff(
            a_text.split("\n") if a_text else [],
            b_text.split("\n") if b_text else [],
            fromfile=f"a/{path_a}", tofile=f"b/{path_b}", lineterm="",
        )
    )
    head = f"diff --git a/{path_a} b/{path_b}\n"
    if extra_header:
        head += extra_header + "\n"
    return head + body


def test_diff_blank_context_line_keeps_positions(spark):
    """Mail clients strip the trailing whitespace off ' ' context lines,
    leaving '' inside a hunk; it must still advance BOTH line cursors or
    every later change in the hunk lands one line early."""
    from activedata_etl_spark.sources.diff import apply_changes, parse_unified_diff

    old = "one\n\nthree\nfour"
    diff = (
        "diff --git a/f.txt b/f.txt\n"
        "--- a/f.txt\n"
        "+++ b/f.txt\n"
        "@@ -1,4 +1,4 @@\n"
        " one\n"
        "\n"                    # stripped empty context line (was ' ')
        " three\n"
        "-four\n"
        "+FOUR\n"
    )
    (ev,) = parse_unified_diff(diff)
    assert apply_changes(old, ev["changes"]) == "one\n\nthree\nFOUR"


def test_cosine_zero_vector_never_ranks(spark):
    """A zero-norm embedding yields NULL cosine (not NaN, which Spark sorts
    ABOVE every number): it must not appear as anyone's nearest neighbor nor
    pass a >= threshold near-dup filter."""
    from activedata_etl_spark.operators.dedup import embedding_neardup_lsh
    from activedata_etl_spark.operators.similarity import cosine_topk

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id = 0")
    top = cosine_topk(emb, q, k=2).collect()
    assert [r["neighbor_id"] for r in top] == [1]  # zero vector filtered
    pairs = embedding_neardup_lsh(
        emb, "vec_id", "embedding", threshold=0.5, n_planes=2
    ).collect()
    assert all(2 not in (r["id_a"], r["id_b"]) for r in pairs)


def test_diff_parse_apply_roundtrip(spark):
    """Unified diff -> change events -> apply == new content; reversed apply
    restores the old content (mo_hg/parse.py:35-174 + apply.py:85-161)."""
    from activedata_etl_spark.sources.diff import (
        apply_changes,
        diff_to_events,
        parse_unified_diff,
        reverse_changes,
    )

    a = "alpha\nbravo\ncharlie\ndelta\necho"
    b = "alpha\ncharlie\ndelta\nxray\necho\nzulu"
    d1 = _git_diff("src/f.py", "src/f.py", a, b)
    d2 = _git_diff("docs/new.md", "docs/new.md", "", "hello\nworld",
                   extra_header="new file mode 100644")
    full = d1 + "\n" + d2

    files = parse_unified_diff(full)
    assert [f["op"] for f in files] == ["update", "insert"]
    assert files[0]["n_removed"] == 1 and files[0]["n_added"] == 2

    # forward apply reproduces the new content
    assert apply_changes(a, files[0]["changes"]) == b
    assert apply_changes("", files[1]["changes"]) == "hello\nworld"
    # backwards apply restores the old content
    assert apply_changes(b, reverse_changes(files[0]["changes"])) == a

    # Spark surface: one event row per touched file, Arrow-batched
    df = spark.createDataFrame([("r1", "c" * 12, full)], "repo string, commit string, diff string")
    evs = diff_to_events(df).orderBy("new_path").collect()
    assert [(e["repo"], e["new_path"], e["op"]) for e in evs] == [
        ("r1", "docs/new.md", "insert"), ("r1", "src/f.py", "update"),
    ]

    # rename + delete ops
    d3 = _git_diff("old/name.py", "new/name.py", "x\ny", "x\ny\nz")
    d4 = _git_diff("gone.py", "gone.py", "a\nb", "",
                   extra_header="deleted file mode 100644")
    files2 = parse_unified_diff(d3 + "\n" + d4)
    assert [f["op"] for f in files2] == ["rename", "delete"]


def test_diff_apply_udf(spark):
    from activedata_etl_spark.sources.diff import (
        apply_changes_udf,
        diff_to_events,
    )
    from pyspark.sql import functions as F

    a = "one\ntwo\nthree"
    b = "one\n2\nthree\nfour"
    df = spark.createDataFrame(
        [("r", "c" * 12, _git_diff("f.txt", "f.txt", a, b))],
        "repo string, commit string, diff string",
    )
    evs = diff_to_events(df).withColumn("base", F.lit(a))
    out = evs.select(
        apply_changes_udf()(F.col("base"), F.col("changes")).alias("applied")
    ).first()
    assert out["applied"] == b


def test_cli_replay_analyze_compact(spark, tmp_path, capsys):
    """spark-submit CLI round-trip: replay -> analyze -> threshold compact —
    the deploy surface (`main.py`) drives the same engine APIs
    (getOrCreate reuses the test session)."""
    import json as _json

    from activedata_etl_spark.journal import write_journal
    from activedata_etl_spark.main import main as cli

    jd, loc = str(tmp_path / "j"), str(tmp_path / "lake")
    write_journal(spark, 2048, jd)
    cli(["replay", "--journal", jd, "--table", loc,
         "--chunk-events", "2048", "--expected-rows", "1000"])
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    r = _json.loads(out[-1])
    assert r["events"] > 2000 and r["batches"] == 1

    cli(["analyze", "--table", loc])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] > 0 and "repo" in stats["columns"]

    cli(["compact", "--table", loc, "--if-deltas-over", "0"])
    v = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["compacted_to_version"] is None  # no deltas -> no-op

    cli(["compact", "--table", loc, "--drop-tombstones"])
    v = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(v["compacted_to_version"], int)

    n0 = SnapshotTable(spark, loc).read().count()
    cli(["rebucket", "--table", loc, "--n-buckets", "16"])
    rb = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rb["n_buckets"] == 16
    assert SnapshotTable(spark, loc).read().count() == n0

    # distributed convergence audit: replayed table == journal's LWW state
    cli(["verify", "--journal", jd, "--table", loc])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["converged"] and rep["missing"] == 0 and rep["extra"] == 0
    # ...and divergence is detected (and exits nonzero): delete one row
    import pytest as _pytest

    SnapshotTable(spark, loc).delete_where("offset = 0 or commit_seq = 1")
    with _pytest.raises(SystemExit):
        cli(["verify", "--journal", jd, "--table", loc])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not rep["converged"] and rep["missing"] >= 1


def test_es_bulk_formatter(spark, tmp_path):
    """_bulk NDJSON: alternating action/source lines with external_gte
    versioning (elasticsearch.py:314-335)."""
    import glob
    import json

    from activedata_etl_spark.sinks.es_bulk import bulk_action_lines, write_bulk_files

    df = spark.createDataFrame(
        [("r1", "a.py", 5, 2, "X"), ("r1", "b.py", 9, 1, "Y")],
        "repo string, path string, commit_seq long, offset long, content string",
    )
    rows = bulk_action_lines(df).orderBy("action_line").collect()
    a0 = json.loads(rows[0]["action_line"])
    # _id is the key as JSON: null parts and delimiter chars cannot collide
    assert json.loads(a0["index"]["_id"]) == {"repo": "r1", "path": "a.py"}
    assert a0["index"]["version_type"] == "external_gte"
    assert a0["index"]["version"] == 5 * 1_000_000 + 2
    # distinct keys with null parts / embedded ':' stay distinct
    tricky = spark.createDataFrame(
        [(None, "x", 1, 0, "A"), ("x", None, 1, 0, "B"),
         ("a:b", "c", 1, 0, "C"), ("a", "b:c", 1, 0, "D")],
        "repo string, path string, commit_seq long, offset long, content string",
    )
    ids = [json.loads(r["action_line"])["index"]["_id"]
           for r in bulk_action_lines(tricky).collect()]
    assert len(set(ids)) == 4
    # null key fields are RENDERED (not dropped): every id carries every
    # key column, so which-column-is-null is explicit in the id itself
    assert {"repo": None, "path": "x"} in [json.loads(i) for i in ids]
    assert {"repo": "x", "path": None} in [json.loads(i) for i in ids]
    # a too-small scale must raise, not write a stale-looking version —
    # including the FIXED default (standalone renders never auto-size:
    # two calls could resolve different scales and a shrink silently
    # loses newer docs to external_gte); an explicit larger scale works
    import pytest as _pytest

    big = spark.createDataFrame(
        [("r", "p", 1, 2_000_000, "Z")],
        "repo string, path string, commit_seq long, offset long, content string",
    )
    with _pytest.raises(Exception, match="version overflow"):
        bulk_action_lines(big, version_scale=1_000_000).collect()
    with _pytest.raises(Exception, match="version overflow"):
        bulk_action_lines(big).collect()
    explicit = json.loads(
        bulk_action_lines(big, version_scale=10_000_000)
        .collect()[0]["action_line"]
    )
    assert explicit["index"]["version"] == 1 * 10_000_000 + 2_000_000
    s0 = json.loads(rows[0]["source_line"])
    assert s0 == {"repo": "r1", "path": "a.py", "commit_seq": 5, "offset": 2,
                  "content": "X"}

    out = str(tmp_path / "bulk")
    write_bulk_files(df, out, batch_size=1000)
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        lines += [ln for ln in open(f).read().split("\n") if ln]
    assert len(lines) == 4  # 2 docs x (action + source)
    assert all(json.loads(ln) for ln in lines)


def test_cli_replay_and_lineage(spark, tmp_path):
    """spark-submit CLI surface: replay + compact + lineage subcommands run
    against a real journal (session reused via getOrCreate)."""
    import json as _json

    from activedata_etl_spark.journal import write_journal
    from activedata_etl_spark.lake.table import SnapshotTable
    from activedata_etl_spark.main import main as cli

    jd, loc = str(tmp_path / "j"), str(tmp_path / "lake_cli")
    write_journal(spark, 1024, jd)
    cli(["replay", "--journal", jd, "--table", loc, "--chunk-events", "512"])
    t = SnapshotTable(spark, loc)
    assert t.read().count() > 0
    v = t.current_version()
    cli(["compact", "--table", loc])
    assert t.current_version() == v + 1
    cli(["backfill", "--journal", jd, "--table", loc, "--offsets", "0..511"])
    cli(["lineage", "--table", loc])


def test_export_changes_incremental_bulk(spark, tmp_path):
    """push_to_es over CDC: the change feed renders as versioned index +
    delete bulk actions, the cursor resumes in snapshot properties, and a
    caught-up export is a no-op."""
    import glob
    import json

    from activedata_etl_spark.functions.normalize import normalize_batch
    from activedata_etl_spark.sinks.es_bulk import export_changes

    t = _mk_table(spark, tmp_path, [
        (0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", None),
        (0, 1, 1, "insert", "r", "b.js", "d" * 12, None, "Y", None),
    ], "t_esx")
    out = str(tmp_path / "esx")
    s1 = export_changes(t, out)
    assert (s1["docs"], s1["deletes"]) == (2, 0)

    b2 = spark.createDataFrame([
        (0, 2, 2, "update", "r", "a.py", "e" * 12, None, "X2", None),
        (0, 3, 3, "delete", "r", "b.js", "f" * 12, None, None, None),
    ], COLS)
    apply_batch(t, normalize_batch(b2), 1)
    s2 = export_changes(t, out)
    assert (s2["docs"], s2["deletes"]) == (1, 1)
    assert s2["from_version"] == s1["to_version"]

    lines = []
    for f in sorted(glob.glob(f"{s2['out']}/part-*")):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    actions = [json.loads(ln) for ln in lines if '"index"' in ln or '"delete"' in ln]
    by_op = {}
    for a in actions:
        (op, meta), = a.items()
        by_op.setdefault(op, []).append(meta)
    # update -> index action with the UPDATE's version; its source line follows
    assert len(by_op["index"]) == 1
    assert json.loads(by_op["index"][0]["_id"])["path"] == "a.py"
    assert by_op["index"][0]["version"] == 2 * 1_000_000 + 2
    srcs = [json.loads(ln) for ln in lines if '"content"' in ln]
    assert [s["content"] for s in srcs] == ["X2"]
    # delete -> versioned delete action carrying the tombstone's version,
    # and NO source line (the null was dropped, not rendered)
    assert len(by_op["delete"]) == 1
    assert json.loads(by_op["delete"][0]["_id"])["path"] == "b.js"
    assert by_op["delete"][0]["version"] == 3 * 1_000_000 + 3
    assert len(lines) == 3  # index + its source + delete

    # caught up: no-op, cursor unmoved
    s3 = export_changes(t, out)
    assert s3 == {"docs": 0, "deletes": 0, "from_version": s3["from_version"],
                  "to_version": s3["from_version"], "out": None}
    # explicit range re-export is byte-stable (same dir, overwritten)
    s4 = export_changes(t, out, from_version=s2["from_version"],
                        to_version=s2["to_version"])
    assert s4["out"] == s2["out"] and (s4["docs"], s4["deletes"]) == (1, 1)


def test_export_changes_autosizes_version_scale(spark, tmp_path):
    """A journal whose per-partition offsets exceed the old fixed 1e6
    default exports cleanly: the scale is sized from the range's data,
    persisted in the table properties, and NEVER shrinks on later exports
    (versions stay monotone per document across exports)."""
    import glob
    import json

    from activedata_etl_spark.functions.normalize import normalize_batch
    from activedata_etl_spark.sinks.es_bulk import export_changes

    t = _mk_table(spark, tmp_path, [
        (0, 5_000_000, 3, "insert", "r", "a.py", "c" * 12, None, "X", None),
    ], "t_esscale")
    out = str(tmp_path / "esscale")
    s1 = export_changes(t, out)
    assert s1["docs"] == 1
    lines = []
    for f in sorted(glob.glob(f"{s1['out']}/part-*")):
        lines += [ln for ln in open(f).read().splitlines() if ln]
    v1 = json.loads(lines[0])["index"]["version"]
    assert v1 == 3 * 10_000_000 + 5_000_000
    props = t.snapshot().get("properties", {})
    assert int(props["es_export_es_scale"]) == 10_000_000
    # a later range with SMALL offsets (partition 1, so the partition-0
    # watermark fence doesn't swallow it) computes auto scale 1e6 but must
    # reuse the stored LARGER scale — the same doc's new version exceeds
    # its old one
    b2 = spark.createDataFrame(
        [(1, 7, 4, "update", "r", "a.py", "e" * 12, None, "X2", None)], COLS)
    apply_batch(t, normalize_batch(b2), 1)
    s2 = export_changes(t, out)
    assert s2["docs"] == 1
    lines2 = []
    for f in sorted(glob.glob(f"{s2['out']}/part-*")):
        lines2 += [ln for ln in open(f).read().splitlines() if ln]
    v2 = json.loads(lines2[0])["index"]["version"]
    assert v2 == 4 * 10_000_000 + 7 and v2 > v1


def test_export_changes_survives_rebucket_without_repaying_diff(spark, tmp_path):
    """A rebucket makes bucket ids incomparable, so the next export pays
    one full (empty) diff — and must ADVANCE the cursor past it, or every
    poll would re-pay the full-table diff forever.  The follow-up poll
    then short-circuits on the free changed_buckets check without minting
    a commit."""
    from activedata_etl_spark.sinks.es_bulk import export_changes

    t = _mk_table(spark, tmp_path, [
        (0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", None),
        (0, 1, 1, "insert", "r", "b.js", "d" * 12, None, "Y", None),
    ], "t_esrb")
    out = str(tmp_path / "esrb")
    assert export_changes(t, out)["docs"] == 2

    t.rebucket(8)  # row-identical rewrite; fingerprints incomparable
    s = export_changes(t, out)
    assert (s["docs"], s["deletes"], s["out"]) == (0, 0, None)
    assert s["to_version"] > s["from_version"]  # cursor crossed the rebucket
    v = t.current_version()
    s2 = export_changes(t, out)
    assert s2["to_version"] == s2["from_version"]  # free no-op...
    assert t.current_version() == v                # ...with no commit minted
    # real changes after the rebucket still export normally
    from activedata_etl_spark.functions.normalize import normalize_batch
    b = spark.createDataFrame(
        [(0, 2, 2, "update", "r", "a.py", "e" * 12, None, "X2", None)], COLS)
    apply_batch(t, normalize_batch(b), 1)
    s3 = export_changes(t, out)
    assert (s3["docs"], s3["deletes"]) == (1, 0)


def test_jsonl_export_deterministic_shards(spark, tmp_path):
    """Sharded JSONL export: membership and line order are functions of
    the DATA only — re-exporting a differently-partitioned same frame
    yields identical decompressed shard contents; manifest counts and
    exact byte sizes agree with what landed on disk."""
    import gzip
    import glob
    import json as _json

    from activedata_etl_spark.sinks.jsonl_export import export_jsonl_shards

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_jsonl_shards(df, p1, id_col="doc_id", n_shards=7)
    m2 = export_jsonl_shards(
        df.repartition(13).sortWithinPartitions("text"),
        p2, id_col="doc_id", n_shards=7,
    )
    assert m1 == m2 and len(m1) == 7
    assert sum(m["n_rows"] for m in m1) == 500

    def shard_lines(base, s):
        out = []
        for fn in sorted(glob.glob(f"{base}/data/shard={s}/part-*")):
            with gzip.open(fn, "rt") as f:
                out.extend(f.read().splitlines())
        return out

    for s in range(7):
        l1, l2 = shard_lines(p1, s), shard_lines(p2, s)
        assert l1 == l2
        assert len(l1) == m1[s]["n_rows"]
        # exact uncompressed bytes incl. newlines
        assert sum(len(x.encode()) + 1 for x in l1) == m1[s]["n_bytes"]
        for line in l1[:3]:  # round-trips as JSON with the input fields
            d = _json.loads(line)
            assert d["text"] == f"text-{d['doc_id']}"

    man = _json.load(open(f"{p1}/manifest.json"))
    assert man["total_rows"] == 500 and man["n_shards"] == 7
    # reading back through Spark sees the partition column + all rows
    rb = spark.read.text(f"{p1}/data")
    assert rb.count() == 500


def test_jsonl_export_string_ids_and_guards(spark, tmp_path):
    """String ids shard through xxhash64 (no silent null-cast); null ids
    and bad shard counts fail loudly; empty shards appear in the manifest
    as zeros."""
    from activedata_etl_spark.sinks.jsonl_export import export_jsonl_shards

    df = spark.createDataFrame(
        [(f"uuid-{i}", i) for i in range(40)], "doc_id string, v long"
    )
    m = export_jsonl_shards(
        df, str(tmp_path / "s"), id_col="doc_id", n_shards=64
    )
    assert sum(x["n_rows"] for x in m) == 40
    assert any(x["n_rows"] == 0 and x["n_bytes"] == 0 for x in m)

    withnull = df.union(
        spark.createDataFrame([(None, 99)], "doc_id string, v long")
    )
    with pytest.raises(ValueError, match="null"):
        export_jsonl_shards(
            withnull, str(tmp_path / "n"), id_col="doc_id", n_shards=4
        )
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards(df, str(tmp_path / "z"), id_col="doc_id", n_shards=0)


def test_reingest_quarantine_admits_late_keeps_invalid(spark, tmp_path):
    """reingest_quarantine applies quarantined LATE rows (operator
    decision), leaves null-key rows quarantined under the original dir,
    archives the consumed dir, never moves the fence, and is idempotent."""
    import datetime as dt

    from activedata_etl_spark.functions.normalize import normalize_batch
    from activedata_etl_spark.streaming.replay import (
        ensure_table,
        reingest_quarantine,
    )

    cols = ("partition int, offset long, commit_seq long, op string, "
            "repo string, path string, commit string, lang string, "
            "content string, ts timestamp")
    t1 = dt.datetime(2024, 6, 1)
    old = dt.datetime(2023, 1, 1)
    loc = str(tmp_path / "lake_rq")
    b0 = spark.createDataFrame(
        [(0, 0, 0, "insert", "r", "a.py", "c" * 12, None, "X", t1)], cols)
    table = ensure_table(spark, loc, b0.schema)
    apply_batch(table, normalize_batch(b0), 0, late_threshold_sec=86400)
    b1 = spark.createDataFrame(
        [(0, 1, 1, "insert", None, "bad.py", "d" * 12, None, "Y", t1),
         (0, 2, 2, "insert", "r", "late.py", "e" * 12, None, "Z", old),
         (0, 3, 3, "insert", "r", "ok.py", "f" * 12, None, "W", t1)], cols)
    apply_batch(table, normalize_batch(b1), 1, late_threshold_sec=86400)
    assert {r["path"] for r in table.read().collect()} == {"a.py", "ok.py"}
    fence, wm = table.last_batch_id(), table.watermarks()

    s = reingest_quarantine(spark, loc)
    assert s["events_reapplied"] == 1 and s["unrecoverable"] == 1
    assert s["archived"] == ["b1"] and s["fence_moved"] is False
    # the late row is now live; the invalid row is not
    assert {r["path"] for r in table.read().collect()} == {
        "a.py", "ok.py", "late.py"}
    assert table.last_batch_id() == fence and table.watermarks() == wm
    # the original dir now holds ONLY the unrecoverable row; audit archive exists
    left = spark.read.parquet(f"{loc}/quarantine/b1")
    assert [r["path"] for r in left.collect()] == ["bad.py"]
    arch = spark.read.parquet(f"{loc}/quarantine/.reingested_b1")
    assert {r["path"] for r in arch.collect()} == {"bad.py", "late.py"}
    # idempotent: second call finds only the invalid remainder, applies 0
    s2 = reingest_quarantine(spark, loc)
    assert s2["events_reapplied"] == 0 and s2["unrecoverable"] == 1
    assert s2["archived"] == [] and s2["fence_moved"] is False
    assert table.read().count() == 3
