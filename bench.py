#!/usr/bin/env python
"""Benchmark: CDC replay throughput at two parallelism levels (the north-rule
scaling-efficiency evidence) + the full query-surface suite at sf0.1.

Prints ONE JSON line:
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "cdc": {events, events_per_sec_N, events_per_sec_4N,
           scaling_efficiency, salted_events_per_sec_4N}}

Protocol per BASELINE.md: same journal, same code path, local[8] vs
local[32]; throughput = events applied / replay wall-clock (excluding
session start); efficiency = (eps_4N / eps_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", str(1 << 20)))
CHUNK = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", str(1 << 18)))
SMALL = max(CPUS // 4, 1)  # the "N executors" level; CPUS is "4N"


def _new_session(parallelism: int):
    from activedata_etl_spark.session import get_spark

    return get_spark(
        f"bench_p{parallelism}",
        parallelism=parallelism,
        shuffle_partitions=max(parallelism * 2, 8),
    )


def bench_replay(parallelism: int, journal_dir: str, workdir: str, salted: bool):
    from activedata_etl_spark.streaming.replay import replay_journal

    spark = _new_session(parallelism)
    try:
        loc = os.path.join(workdir, f"lake_p{parallelism}_{'s' if salted else 'u'}")
        res = replay_journal(
            spark, journal_dir, loc, chunk_events=CHUNK, salted=salted
        )
        return res
    finally:
        spark.stop()


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="bench_")
    try:
        # ---- journal (generated once, reused by every replay) -------------
        spark = _new_session(CPUS)
        from activedata_etl_spark.journal import write_journal

        journal_dir = os.path.join(workdir, "journal")
        write_journal(spark, N_EVENTS, journal_dir)

        # ---- query suite at SF_DIR ----------------------------------------
        from activedata_etl_spark.plans.queries import SPARK_QUERIES

        qtimes: dict[str, float] = {}
        for name, fn in SPARK_QUERIES.items():
            t0 = time.time()
            fn(spark, SF_DIR).count()
            qtimes[name] = round(time.time() - t0, 3)
        spark.stop()

        # ---- CDC replay at N and 4N parallelism ---------------------------
        r_small = bench_replay(SMALL, journal_dir, workdir, salted=False)
        r_big = bench_replay(CPUS, journal_dir, workdir, salted=False)
        r_salt = bench_replay(CPUS, journal_dir, workdir, salted=True)

        eps_small = r_small["events_per_sec"]
        eps_big = r_big["events_per_sec"]
        eff = round((eps_big / eps_small) / (CPUS / SMALL), 3) if eps_small else 0.0

        qtimes[f"cdc_replay_local{SMALL}"] = r_small["elapsed_sec"]
        qtimes[f"cdc_replay_local{CPUS}"] = r_big["elapsed_sec"]
        qtimes[f"cdc_replay_local{CPUS}_salted"] = r_salt["elapsed_sec"]

        total = round(sum(qtimes.values()), 3)
        out = {
            "metric": "suite_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": qtimes,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "cdc": {
                "events": r_big["events"],
                f"events_per_sec_local{SMALL}": eps_small,
                f"events_per_sec_local{CPUS}": eps_big,
                "scaling_efficiency": eff,
                f"salted_events_per_sec_local{CPUS}": r_salt["events_per_sec"],
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
