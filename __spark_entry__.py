"""Driver contract for the spark-graft builder (PySpark target).

entry()      flagship query on sf0.001 (CDC LWW latest-state + enrichment)
queries()    every implemented operator from SURVEY.md §2 (plans/queries.py)
oracle_sql() matching DuckDB SQL for EVERY registry query — including the
             hash-defined ops (minhash-LSH, simhash, hyperplane ANN via the
             SQL-expressible mix31 hash family) and IVF ANN (deterministic
             seed-row centroids; trained-kmeans mode verified separately in
             tests/ with recall bound + BLAS/Catalyst path parity).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from activedata_etl_spark.plans.queries import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: LWW latest-event state per user (the CDC reduce
    semantics of the engine) enriched with a per-type histogram."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    return (
        latest.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users_latest"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
