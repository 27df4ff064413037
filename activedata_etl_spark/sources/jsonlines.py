"""JSON-lines sources (gzip/zip-compressed) — the reference's S3 block reader.

Analog of ``Bucket.read_lines`` / ``big_data.py`` streaming decompression
(`vendor/pyLibrary/aws/s3.py:271`, `vendor/pyLibrary/env/big_data.py:33-200`)
and the streaming JSON parser (`vendor/mo_json/stream.py:31-301`):

- gzip: Spark's file sources decompress ``.gz`` transparently; a prefix is a
  directory path (partition pruning = prefix listing, `s3.py:230`).
- dynamic documents: read with an explicit (or sampled) schema, then
  ``from_json`` / ``get_json_object`` for nested extraction and
  ``explode_outer`` for the reference's query-path dives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonlines(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Read (optionally gzip-compressed) JSON-lines into a DataFrame.

    With ``schema=None`` Spark samples to infer — fine interactively; always
    pass a schema in pipelines (inference is a full extra pass).
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.option("multiLine", multiline).json(path)


def parse_json_column(
    df: DataFrame, col: str, schema: T.StructType | str, out: str = "parsed"
) -> DataFrame:
    """``from_json`` over a dynamic-JSON string column (mo_json/stream.py
    analog: project just the expected vars out of arbitrary documents)."""
    return df.withColumn(out, F.from_json(F.col(col), schema))


def explode_path(df: DataFrame, array_col: str, out: str = "item") -> DataFrame:
    """Nested-array dive (`drill_filter`/nested query-path analog):
    ``explode_outer`` keeps rows whose array is null/empty."""
    return df.withColumn(out, F.explode_outer(F.col(array_col)))
