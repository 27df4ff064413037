"""Rollover time-partitioned sink — route rows to time partitions, reject
too-old rows, expire aged partitions.

Reference parity (`vendor/pyLibrary/env/rollover_index.py:40-130`):
- ``rollover_field``  timestamp column that decides the partition,
- ``rollover_interval`` floor(timestamp, interval) names the partition
  (``_get_queue`` rounds to the interval and routes to that index),
- ``rollover_max``    rows older than now - max are REJECTED (DATA_TOO_OLD,
  :74-77) instead of creating ancient partitions,
- ``_delete_old_indexes`` (:121-130) drops whole indexes past the horizon —
  here: whole partition directories, an O(1) metadata delete instead of a
  row-level DELETE.

Spark-first shape: routing is one ``date_trunc`` + dynamic-partition
parquet write (``partitionBy``), so partition pruning reaches every
downstream reader, and age-based expiry is directory removal.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "__rollover"
PART_FMT = "%Y%m%d_%H%M%S"  # reference INDEX_DATE_FORMAT (rollover_index.py)


class RolloverSink:
    """Append-only time-partitioned parquet sink with age-based expiry."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        *,
        rollover_field: str = "ts",
        rollover_interval: str = "month",
        rollover_max: dt.timedelta | None = None,
        now: dt.datetime | None = None,
    ):
        self.spark = spark
        self.location = location.rstrip("/")
        self.rollover_field = rollover_field
        self.rollover_interval = rollover_interval
        self.rollover_max = rollover_max
        # injectable clock for deterministic tests
        self._now = now

    def _part(self) -> "F.Column":
        return F.date_format(
            F.date_trunc(self.rollover_interval, F.col(self.rollover_field)),
            "yyyyMMdd_HHmmss",
        )

    def write(self, df: DataFrame) -> dict:
        """Route rows to their time partition; too-old rows are rejected to a
        quarantine dir (DATA_TOO_OLD), null-timestamp rows are dropped (the
        reference returns Null as the queue — the row goes nowhere)."""
        from pyspark.sql import Observation

        now = self._now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        routed = df.withColumn(PART_COL, self._part())
        live = routed.where(F.col(PART_COL).isNotNull())
        if self.rollover_max is None:
            (live.write.mode("append").partitionBy(PART_COL)
             .parquet(os.path.join(self.location, "data")))
            return {"rejected_too_old": 0}
        # ONE scan feeds the live write AND counts the rejects (Observation
        # rides the write job — the apply_batch pattern, lake/merge.py); the
        # quarantine write is a second scan ONLY when rejects exist.  The
        # old shape (`too_old.count()` + quarantine write + live write) was
        # three full input scans on every batch.
        horizon = now - self.rollover_max
        old_flag = F.col(self.rollover_field) < F.lit(horizon)
        obs = Observation("rollover_write")
        observed = live.observe(
            obs, F.sum(old_flag.cast("long")).alias("n_old")
        )
        (observed.where(~old_flag).write.mode("append").partitionBy(PART_COL)
         .parquet(os.path.join(self.location, "data")))
        n_old = int(obs.get["n_old"] or 0)
        if n_old:
            (live.where(old_flag).drop(PART_COL).write.mode("append")
             .parquet(os.path.join(self.location, "_too_old")))
        return {"rejected_too_old": n_old}

    def _floor(self, t: dt.datetime) -> dt.datetime:
        """Floor a timestamp to the rollover interval (date_trunc analog)."""
        iv = self.rollover_interval
        day0 = t.replace(hour=0, minute=0, second=0, microsecond=0)
        if iv == "year":
            return day0.replace(month=1, day=1)
        if iv == "quarter":
            return day0.replace(month=(t.month - 1) // 3 * 3 + 1, day=1)
        if iv == "month":
            return day0.replace(day=1)
        if iv == "week":  # date_trunc week = Monday
            return day0 - dt.timedelta(days=t.weekday())
        if iv == "day":
            return day0
        if iv == "hour":
            return t.replace(minute=0, second=0, microsecond=0)
        if iv == "minute":
            return t.replace(second=0, microsecond=0)
        raise ValueError(f"unsupported rollover interval: {iv!r}")

    def _next(self, start: dt.datetime) -> dt.datetime:
        """Exclusive end of the partition beginning at ``start``."""
        iv = self.rollover_interval
        if iv in ("year", "quarter", "month"):
            months = {"year": 12, "quarter": 3, "month": 1}[iv]
            m = start.month - 1 + months
            return start.replace(year=start.year + m // 12, month=m % 12 + 1)
        step = {"week": dt.timedelta(weeks=1), "day": dt.timedelta(days=1),
                "hour": dt.timedelta(hours=1),
                "minute": dt.timedelta(minutes=1)}[iv]
        return start + step

    def read(self, since: dt.datetime | None = None) -> DataFrame:
        """Scan, optionally bounded below — the partition filter prunes whole
        directories (verify with .explain: PartitionFilters on __rollover).

        ``since`` is floored to the rollover interval first: the boundary
        partition (whose name precedes ``since`` but whose rows may not)
        must stay in the scan; the row-level bound rides on top."""
        out = self.spark.read.parquet(os.path.join(self.location, "data"))
        if since is not None:
            out = out.where(
                (F.col(PART_COL) >= self._floor(since).strftime(PART_FMT))
                & (F.col(self.rollover_field) >= F.lit(since))
            )
        return out

    def partitions(self) -> list[str]:
        root = os.path.join(self.location, "data")
        if not os.path.isdir(root):
            return []
        pre = f"{PART_COL}="
        return sorted(d[len(pre):] for d in os.listdir(root) if d.startswith(pre))

    def expire(self) -> list[str]:
        """Drop whole partitions older than now - rollover_max
        (``_delete_old_indexes`` analog: directory delete, no row rewrite)."""
        if self.rollover_max is None:
            return []
        now = self._now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        horizon = now - self.rollover_max
        removed = []
        for p in self.partitions():
            start = dt.datetime.strptime(p, PART_FMT)
            # the whole partition must be past the horizon: its newest
            # possible row is just under start + interval, so compare the
            # partition END — comparing the start would delete partitions
            # still holding rows inside the retention window
            if self._next(start) <= horizon:
                shutil.rmtree(
                    os.path.join(self.location, "data", f"{PART_COL}={p}"),
                    ignore_errors=True,
                )
                removed.append(p)
        return removed
