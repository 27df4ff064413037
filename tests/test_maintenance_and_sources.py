"""Maintenance ops (update/delete where), backfill range, split sink,
JSON-lines sources, q21 oracle parity."""

from __future__ import annotations

import gzip
import json
import os

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

    # advance the clock: March ages out of the 120-day horizon
    sink._now = dt.datetime(2024, 8, 1)
    removed = sink.expire()
    assert removed == ["20240301_000000"]
    assert {r["id"] for r in sink.read().collect()} == {1, 2}
