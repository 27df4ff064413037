"""SparkSession builders tuned for this engine.

Local mode is the test bed; the configs are chosen so the same code path is
what you would submit to a real multi-executor cluster with
``spark-submit --py-files``:  AQE on (runtime skew-join + partition
coalescing), Arrow on (all pandas UDF traffic), shuffle partitions sized to
the parallelism level instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "activedata_etl_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: N for ``local[N]``; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(parallelism, 32) — at cluster scale
    this would be set to ~2-3x total cores instead.
    """
    cpus = parallelism or os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or max(int(cpus) if cpus else 32, 32)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # smaller input splits: keep wide parallelism on modest batch sizes
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        # let AQE turn the LWW join-back into a broadcast join when the
        # winner set is modest (falls back to shuffle join at real scale)
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
