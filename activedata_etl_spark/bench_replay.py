"""Subprocess entry for one isolated replay measurement.

Usage: python -m activedata_etl_spark.bench_replay <parallelism> <chunk>
           <journal_dir> <lake_dir> [salted]

Fresh JVM per measurement — successive SparkSessions in one process share a
warmed/fragmented heap and skew comparisons.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    par, chunk = sys.argv[1], int(sys.argv[2])
    journal_dir, lake_dir = sys.argv[3], sys.argv[4]
    salted = len(sys.argv) > 5 and sys.argv[5] == "salted"

    from activedata_etl_spark.session import get_spark
    from activedata_etl_spark.streaming.replay import replay_journal

    if "x" in par:
        e, c = par.split("x")
        total = int(e) * int(c)
    else:
        total = int(par)
    spark = get_spark(
        f"bench_replay_{par}", parallelism=par, shuffle_partitions=total * 2
    )
    r = replay_journal(
        spark, journal_dir, lake_dir, chunk_events=chunk,
        salted=salted, persist=False, lineage_level="summary",
    )
    print(json.dumps({
        "par": par,
        "events": r["events"],
        "elapsed_sec": r["elapsed_sec"],
        "events_per_sec": r["events_per_sec"],
    }))


if __name__ == "__main__":
    main()
