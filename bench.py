#!/usr/bin/env python
"""Benchmark: CDC replay throughput at two parallelism levels (the north-rule
scaling-efficiency evidence) + the full query-surface suite at sf0.1.

Prints a full-detail JSON line, then the FINAL line — a compact summary
(guarded to fit the driver's ~2000-char stdout tail window):
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "cdc": {...}}
Full detail (rep speedups, incremental write-amplification block, skew
stage metrics) is also written to BENCH_FULL.json at the repo root.

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
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", str(1 << 25)))
# single batch: per-batch driver fixed cost (~10 s: planning, AQE stage
# scheduling, commit) would otherwise dominate — at 10^10 scale batches are
# 100M+ events, which this approximates; multi-batch resume is correctness-
# tested in pytest
CHUNK = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", str(N_EVENTS)))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
# N vs 4N EXECUTORS (separate JVM processes via local-cluster[E,C,mem]).
# This sandbox caps CPU per *process* — thread-based local[N] cannot scale
# past ~8 threads no matter the code (measured: 32 threads in one process get
# 17x LESS cpu than 32 processes) — so executor processes are the honest
# stand-in for cluster executors.
LEVELS = os.environ.get("SPARK_GRAFT_BENCH_LEVELS", "1x2,4x2").split(",")
if len(LEVELS) != 2:
    raise SystemExit(
        f"SPARK_GRAFT_BENCH_LEVELS must be 'small,big' (two ExC specs), got {LEVELS!r}"
    )
SMALL_SPEC, BIG_SPEC = LEVELS[0], LEVELS[1]


def _burn(q, threads: int = 1):
    import hashlib
    def one(out):
        h = hashlib.sha256()
        data = b"x" * 65536
        t0 = time.time()
        n = 0
        while time.time() - t0 < 2.0:
            h.update(data)
            n += 1
        out.append(n)

    import threading

    counts: list = []
    ts = [threading.Thread(target=one, args=(counts,)) for _ in range(threads)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    q.put(sum(counts))


def cpu_capacity(spec: str) -> float:
    """sha256-loop throughput with the SAME process x thread shape as the
    Spark level: E executor processes each burning C threads — measuring
    only process count would mis-state the capacity of any ExC level whose
    cores-per-executor differ (this sandbox caps CPU per process, so both
    dimensions matter)."""
    execs, cores = _shape(spec)
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, cores)) for _ in range(execs)]
    [p.start() for p in ps]
    total, got = 0.0, 0
    for _ in ps:
        try:
            total += q.get(timeout=30)  # a dead burner must not hang the bench
            got += 1
        except Exception:
            break
    [p.join(timeout=5) for p in ps]
    if got < len(ps):
        print(f"warn: capacity probe got {got}/{len(ps)} burners", file=sys.stderr)
    return total


def _shape(spec: str) -> tuple[int, int]:
    if "x" in spec:
        e, c = spec.split("x")
        return int(e), int(c)
    return int(spec), 1


def _execs(spec: str) -> int:
    return _shape(spec)[0]


def replay_subprocess(par: str, journal: str, lake: str, salted: bool = False) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    args = [sys.executable, "-m", "activedata_etl_spark.bench_replay",
            str(par), str(CHUNK), journal, lake]
    if salted:
        args.append("salted")
    out = subprocess.run(
        args, capture_output=True, text=True, env=env, timeout=1200
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench_replay {par} failed (rc={out.returncode}); stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-15:])
        )
    return json.loads(lines[-1])


def _measure(par: str, journal: str, workdir: str, tag: str, salted: bool = False) -> dict:
    lake = os.path.join(workdir, f"lake_{tag}")
    r = replay_subprocess(par, journal, lake, salted)
    shutil.rmtree(lake, ignore_errors=True)
    return r


def _best(a: dict | None, b: dict) -> dict:
    return b if a is None or b["events_per_sec"] > a["events_per_sec"] else a


# steady-state incremental: base table size, events per small batch, batches.
# A 4096-event batch over the ~670k-key space touches ~0.6% of keys — the
# many-small-batches-against-a-big-table shape that CoW amplifies.
INC_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_INC_BASE", str(1 << 23)))
INC_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_INC_EVENTS", "4096"))
INC_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_INC_BATCHES", "8"))
if N_EVENTS < INC_BASE + INC_EVENTS * INC_BATCHES:
    # a shrunken sanity run (small SPARK_GRAFT_BENCH_EVENTS) must shrink the
    # incremental protocol with it — offset ranges beyond the journal would
    # silently apply nothing and report degenerate write amplification
    INC_BASE = max(INC_EVENTS, N_EVENTS - INC_EVENTS * INC_BATCHES)
    print(
        f"warn: journal ({N_EVENTS} events) smaller than the incremental "
        f"protocol; shrinking INC_BASE to {INC_BASE}",
        file=sys.stderr,
    )


def incremental_subprocess(par: str, journal: str, workdir: str, mode: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    lake = os.path.join(workdir, f"lake_inc_{mode}")
    args = [sys.executable, "-m", "activedata_etl_spark.bench_incremental",
            str(par), journal, lake, mode,
            str(INC_BASE), str(INC_EVENTS), str(INC_BATCHES)]
    out = subprocess.run(args, capture_output=True, text=True, env=env, timeout=1200)
    shutil.rmtree(lake, ignore_errors=True)
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench_incremental {mode} failed (rc={out.returncode}); stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-15:])
        )
    return json.loads(lines[-1])


ZONE_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_ZONE_BASE", str(1 << 21)))
ZONE_TAIL = int(os.environ.get("SPARK_GRAFT_BENCH_ZONE_TAIL", "24"))
ZONE_BUCKETS = int(os.environ.get("SPARK_GRAFT_BENCH_ZONE_BUCKETS", "256"))


def zone_subprocess(par: str, workdir: str) -> dict | None:
    """Measured zone-map pruning + sorted-compaction row-group skipping
    (bench_zone docstring has the protocol).  Returns None on failure —
    the pruning numbers are evidence, not a gate; the suite must not die
    on a probe."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    args = [sys.executable, "-m", "activedata_etl_spark.bench_zone",
            str(par), str(ZONE_BASE), str(ZONE_TAIL), str(ZONE_BUCKETS),
            workdir]
    out = subprocess.run(args, capture_output=True, text=True, env=env,
                         timeout=1200)
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        print("warn: bench_zone failed; stderr tail:\n"
              + "\n".join(out.stderr.strip().splitlines()[-10:]),
              file=sys.stderr)
        return None
    return json.loads(lines[-1])


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
        e_small, e_big = _execs(SMALL_SPEC), _execs(BIG_SPEC)
        cap_small = cpu_capacity(SMALL_SPEC)
        cap_big = cpu_capacity(BIG_SPEC)
        cap_ratio = cap_big / cap_small if cap_small else float("nan")

        # ---- CDC replay at N and 4N executors (fresh JVMs, best of REPS,
        #      levels INTERLEAVED so slow VM periods hit both equally) ------
        r_small = r_big = r_salt = None
        rep_speedups = []
        for i in range(REPS):
            m_small = _measure(SMALL_SPEC, journal_dir, workdir, f"s{i}")
            m_big = _measure(BIG_SPEC, journal_dir, workdir, f"b{i}")
            r_small = _best(r_small, m_small)
            r_big = _best(r_big, m_big)
            r_salt = _best(
                r_salt, _measure(BIG_SPEC, journal_dir, workdir, f"x{i}", salted=True)
            )
            if m_small["events_per_sec"]:
                # SAME-rep quotient: both legs ran back-to-back in the same
                # VM period, so the ratio measures the engine, not the VM
                rep_speedups.append(
                    m_big["events_per_sec"] / m_small["events_per_sec"]
                )

        # ---- zone-map pruning + row-group skipping evidence ----------------
        zone = zone_subprocess(BIG_SPEC, workdir)

        # ---- steady-state incremental CDC: small batches vs a big table ----
        inc_delta = incremental_subprocess(BIG_SPEC, journal_dir, workdir, "delta")
        inc_cow = incremental_subprocess(BIG_SPEC, journal_dir, workdir, "cow")
        changed = inc_delta["inc_delta_bytes"] or 1  # bytes of the winners
        incremental = {
            "base_events": inc_delta["base_events"],
            "inc_events_per_batch": INC_EVENTS,
            "inc_batches": INC_BATCHES,
            "delta_events_per_sec": inc_delta["inc_events_per_sec"],
            "cow_events_per_sec": inc_cow["inc_events_per_sec"],
            "bytes_changed": changed,
            "bytes_written_delta_incl_compact": inc_delta["inc_bytes_written"],
            "bytes_written_cow": inc_cow["inc_bytes_written"],
            "write_amplification_cow": round(inc_cow["inc_bytes_written"] / changed, 1),
            "write_amplification_delta_incl_compact": round(
                inc_delta["inc_bytes_written"] / changed, 1
            ),
            "compact_sec": inc_delta["compact_sec"],
            "read_sec_with_deltas": inc_delta.get("read_sec_with_deltas"),
            "read_sec_compacted": inc_delta.get("read_sec_compacted"),
        }
        qtimes["cdc_incremental_delta"] = inc_delta["inc_sec"]
        qtimes["cdc_incremental_cow"] = inc_cow["inc_sec"]

        eps_small, eps_big = r_small["events_per_sec"], r_big["events_per_sec"]
        # best-of throughputs answer "how fast can it go"; the SCALING
        # quotient must come from a single rep (same VM period for both
        # legs) — the best-leg ratio can pair a fast-period small with a
        # slow-period big (or vice versa) and print a number that measures
        # the VM, not the engine (observed: 0.81 vs same-period 0.915).
        # Median over reps rejects the odd disturbed rep.
        rep_speedups.sort()
        speedup = (
            rep_speedups[len(rep_speedups) // 2] if rep_speedups
            else (eps_big / eps_small if eps_small else 0.0)
        )
        eff_raw = round(speedup / (e_big / e_small), 3)
        eff_norm = round(speedup / cap_ratio, 3) if cap_ratio else 0.0

        qtimes[f"cdc_replay_{SMALL_SPEC}execs"] = r_small["elapsed_sec"]
        qtimes[f"cdc_replay_{BIG_SPEC}execs"] = r_big["elapsed_sec"]
        qtimes[f"cdc_replay_{BIG_SPEC}execs_salted"] = r_salt["elapsed_sec"]

        total = round(sum(qtimes.values()), 3)
        sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        skew = r_big.get("reduce_stage") or {}
        # the driver records only the last ~2000 chars of stdout, so the
        # FINAL line must stay comfortably inside that window or the round
        # artifact loses its parsed block (BENCH_r04 lesson).  Full detail
        # goes to BENCH_FULL.json (committed in-repo) and to a penultimate
        # detail line; the final line is a compact summary with every query
        # timing, guarded by an explicit size cap.
        full = {
            "metric": "suite_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": qtimes,
            "sf": sf_tag,
            "cdc": {
                "events": r_big["events"],
                "levels": f"{SMALL_SPEC} vs {BIG_SPEC} executors (local-cluster)",
                f"events_per_sec_{SMALL_SPEC}": eps_small,
                f"events_per_sec_{BIG_SPEC}": eps_big,
                "speedup": round(speedup, 3),
                "rep_speedups": [round(s, 3) for s in rep_speedups],
                "scaling_efficiency_raw": eff_raw,
                "cpu_capacity_ratio": round(cap_ratio, 3),
                "scaling_efficiency_hw_normalized": eff_norm,
                f"salted_events_per_sec_{BIG_SPEC}": r_salt["events_per_sec"],
                # skew gate: task-time spread of the heaviest shuffle stage
                # (the LWW reduce) at 4N — map-side combine keeps this ~<2
                "reduce_stage_skew": r_big.get("reduce_stage"),
                # steady-state small-batch ingest + write amplification
                "incremental": incremental,
                # measured bucket-pruning / row-group-skipping ratios
                "zone_pruning": zone,
            },
        }
        if r_big.get("reduce_stage") is None:
            # the gate must never silently vanish from a BENCH file
            print(
                "warn: reduce_stage_skew probe returned no data this run "
                "(see bench_replay stderr for the reason)",
                file=sys.stderr,
            )
        with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
            json.dump(full, f, indent=1)
        print(json.dumps(full, separators=(",", ":")))
        out = {
            "metric": "suite_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in qtimes.items()},
            "sf": sf_tag,
            "cdc": {
                "events": r_big["events"],
                f"events_per_sec_{SMALL_SPEC}": round(eps_small),
                f"events_per_sec_{BIG_SPEC}": round(eps_big),
                "speedup": round(speedup, 3),
                "scaling_efficiency_raw": eff_raw,
                "cpu_capacity_ratio": round(cap_ratio, 3),
                "scaling_efficiency_hw_normalized": eff_norm,
                f"salted_events_per_sec_{BIG_SPEC}": round(
                    r_salt["events_per_sec"]),
                "skew_max_over_mean": skew.get("max_task_over_mean"),
            },
        }
        line = json.dumps(out, separators=(",", ":"))
        if len(line) > 1900:
            # keep the core q* and cdc_* timings in the parsed artifact;
            # the rest stay in BENCH_FULL.json / the detail line above
            kept = {k: v for k, v in out["queries"].items()
                    if k.startswith(("q", "cdc_"))}
            out["queries_omitted"] = len(out["queries"]) - len(kept)
            out["queries"] = kept
            line = json.dumps(out, separators=(",", ":"))
        print(line)
        sys.stdout.flush()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
