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
                        # null payload -> null feature (the sha/n_bytes
                        # columns guard the same way; the decode stub would
                        # otherwise raise on None and kill the stage)
                        _decode_stub(b, k) if b is not None else None
                        for b, k in zip(payloads, kinds)
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), True),
    ]
)


def resize_media(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize step: Arrow-batched over the binary column; the pixel work is
    STUBBED (no image libs in this container — swap the body for
    PIL.Image.resize) but the batch shape, schema, and deterministic output
    contract are the real artifact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"].tolist()
            # deterministic fake "resized" payload: content-addressed digest
            # + target dims (a real codec returns re-encoded bytes here)
            resized = [
                hashlib.sha256(
                    (b or b"") + f"{width}x{height}".encode()
                ).digest()
                for b in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int = 1000, max_frames: int = 16) -> DataFrame:
    """Frame sampling: 1 video row -> N frame rows (the explode-shaped UDTF).
    Frame decode is STUBBED; the row-multiplication, schema, and per-frame
    determinism are real.  Only 'video' rows produce frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                if rec["kind"] != "video" or rec["payload"] is None \
                        or rec["meta"] is None:
                    continue
                duration = int(rec["meta"]["duration_ms"] or 0)
                n = min(max(duration // every_ms, 1), max_frames)
                for i in range(n):
                    ts = i * every_ms
                    rows.append(
                        {
                            "media_id": rec["media_id"],
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame_sha256": hashlib.sha256(
                                rec["payload"] + ts.to_bytes(8, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_sha256"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
