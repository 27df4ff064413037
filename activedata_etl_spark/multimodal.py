"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode/feature steps run as Arrow-batched ``mapInPandas`` so each Python
invocation sees a columnar batch, never a row.  The actual codec work is
STUBBED (no image/audio libs in this container) behind a deterministic fake
so the Spark-side plumbing — schema, batch shape, partitioning — is real and
tested; swap ``_decode_stub`` for PIL/ffmpeg calls on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: text bytes
    as the opaque payload + deterministic metadata (real columns, fake
    codec)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.pmod(F.col("doc_id") * 37, F.lit(1920)).cast("int").alias("width"),
            F.pmod(F.col("doc_id") * 53, F.lit(1080)).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a codec: 8 floats from byte statistics.

    REPLACE with a real decoder (PIL.Image.open / librosa / pyav frame
    sampling) on a cluster that ships those libs.
    """
    if payload is None:
        raise NotImplementedError("real codecs are not available in this sandbox")
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    import hashlib

    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            # single column-wise pass (no pdf.apply(axis=1) row loop): a real
            # codec would likewise consume the payload column as one batch
            payloads = pdf["payload"].tolist()
            kinds = pdf["kind"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                    "payload_sha256": [
                        hashlib.sha256(b).hexdigest() if b is not None else None
                        for b in payloads
                    ],
                    "feature": [
                        _decode_stub(b, k) for b, k in zip(payloads, kinds)
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
