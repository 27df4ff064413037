"""activedata_etl_spark — a from-scratch, PySpark-native CDC / incremental-ingest
engine with the capabilities of ahal/ActiveData-ETL.

The reference (/root/reference) is a queue-driven document ETL pipeline
(SQS -> S3 -> Elasticsearch) plus a vendored query language (jx).  This package
re-expresses those capabilities Spark-first:

- ``journal``      deterministic synthetic CDC change-event journal
                   (analog of the reference's pulse->S3 block stream,
                   activedata_etl/pulse_logger.py:31-90)
- ``functions``    vectorized normalization (typed-JSON analog, lang tagging,
                   content hashing) — Catalyst expressions + Arrow pandas UDFs,
                   never per-row Python
- ``operators``    LWW dedup windows, salted skew-safe reduce, dedup families
                   (exact/minhash/simhash/jaccard), similarity search, text
                   analysis, jx-style edges/windows
- ``lake``         ACID snapshot table format over parquet (Iceberg-style
                   metadata + atomic commit + schema evolution + versioned
                   MERGE upserts); watermark-in-commit exactly-once
- ``streaming``    Structured Streaming / chunked-batch replay drivers with
                   checkpointing, lineage and metrics side tables; stateful
                   per-key counters (applyInPandasWithState)
- ``plans``        the jx query surface (jx-lite compiler) + the 43-query
                   oracle-checked registry
- ``sources``      parquet loaders, gzip JSON-lines, unified-diff parser
- ``sinks``        ES _bulk NDJSON wire-format renderer
- ``main``         spark-submit CLI (replay/stream/backfill/compact/expire)
"""

__version__ = "0.1.0"

ENGINE_REVISION = __version__
