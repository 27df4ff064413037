#!/usr/bin/env python
"""Benchmark: CDC replay throughput at two parallelism levels (the north-rule
scaling-efficiency evidence) + the full query-surface suite at sf0.1.

Prints ONE JSON line:
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "cdc": {...}}

Measurement protocol (BASELINE.md):
- same journal, same code path, parallelism N = CPUS/4 vs 4N = CPUS;
- every replay runs in a FRESH subprocess/JVM (best of REPS runs — this
  sandbox VM shows ±40% run-to-run noise);
- throughput = events read / replay wall-clock (excluding session start);
- raw efficiency = (eps_4N / eps_N) / 4;
- the VM does NOT provide 4x CPU from N to 4N processes (SMT/throttling), so
  we also measure the machine's parallel-compute capacity at both levels
  with a pure busy-loop and report hardware-normalized efficiency =
  raw_speedup / capacity_ratio.  Both numbers are printed.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", str(1 << 22)))
CHUNK = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", str(N_EVENTS // 2)))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
SMALL = max(CPUS // 4, 1)


def _burn(q):
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        n += 1
    q.put(n)


def cpu_capacity(procs: int) -> float:
    """Busy-loop iterations/sec achievable with `procs` processes."""
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q,)) for _ in range(procs)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return float(sum(q.get() for _ in ps))


def replay_subprocess(par: int, journal: str, lake: str, salted: bool = False) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    args = [sys.executable, "-m", "activedata_etl_spark.bench_replay",
            str(par), str(CHUNK), journal, lake]
    if salted:
        args.append("salted")
    out = subprocess.run(
        args, capture_output=True, text=True, env=env, timeout=1200
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def best_of(par: int, journal: str, workdir: str, salted: bool = False) -> dict:
    best = None
    for i in range(REPS):
        lake = os.path.join(workdir, f"lake_{par}_{'s' if salted else 'u'}_{i}")
        r = replay_subprocess(par, journal, lake, salted)
        shutil.rmtree(lake, ignore_errors=True)
        if best is None or r["events_per_sec"] > best["events_per_sec"]:
            best = r
    return best


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="bench_")
    try:
        from activedata_etl_spark.session import get_spark

        spark = get_spark("bench_main", parallelism=CPUS,
                          shuffle_partitions=CPUS * 2)
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

        # ---- hardware parallel-capacity probe -----------------------------
        cap_small = cpu_capacity(SMALL)
        cap_big = cpu_capacity(CPUS)
        cap_ratio = cap_big / cap_small if cap_small else float("nan")

        # ---- CDC replay at N and 4N (fresh JVM each, best of REPS) --------
        r_small = best_of(SMALL, journal_dir, workdir)
        r_big = best_of(CPUS, journal_dir, workdir)
        r_salt = best_of(CPUS, journal_dir, workdir, salted=True)

        eps_small, eps_big = r_small["events_per_sec"], r_big["events_per_sec"]
        speedup = eps_big / eps_small if eps_small else 0.0
        eff_raw = round(speedup / (CPUS / SMALL), 3)
        eff_norm = round(speedup / cap_ratio, 3) if cap_ratio else 0.0

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
                "speedup": round(speedup, 3),
                "scaling_efficiency_raw": eff_raw,
                "cpu_capacity_ratio": round(cap_ratio, 3),
                "scaling_efficiency_hw_normalized": eff_norm,
                f"salted_events_per_sec_local{CPUS}": r_salt["events_per_sec"],
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
