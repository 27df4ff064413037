#!/usr/bin/env python
"""Dev benchmark (guide §1): per-query isolation timing with the noop sink +
optional .explain("formatted") capture.  Does NOT replace bench.py (which is
frozen for measurement); numbers here are for optimization work and for
OPTIMIZATION_r06.md evidence.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 [--reps 2] [--explain-dir plans/r06] \
      [--mode noop|count] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--mode", choices=["noop", "count"], default="count",
                    help="count matches the frozen bench methodology; noop "
                         "forces every column (guide §1.4)")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from activedata_etl_spark.plans.queries import SPARK_QUERIES
    from activedata_etl_spark.session import get_spark

    spark = get_spark("bench_extra", parallelism=args.cpus,
                      shuffle_partitions=args.cpus * 2)
    names = args.names or list(SPARK_QUERIES)
    out = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        best = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)
    print("TOTAL", round(sum(out.values()), 3))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
