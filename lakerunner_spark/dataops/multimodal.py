"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns
with structured metadata. The engine treats the payload as opaque bytes
end-to-end (Parquet binary columns, no materialization on the driver)
and runs decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The codec libraries (Pillow/ffmpeg/...) are NOT in this environment, so
the decode step is stubbed: ``decode_image`` raises NotImplementedError
unless a decoder is injected. Everything around it — schema, batch
iteration, partition-parallel UDF plumbing, metadata handling — is real
and tested with a deterministic fake decoder.

Scale notes: payload bytes never shuffle unless the transform needs
them (select the metadata columns for routing/filtering first);
``spark.sql.files.maxPartitionBytes`` bounds per-task payload volume;
feature outputs are small fixed-width vectors so downstream joins and
ANN run on compact relations.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

# payload bytes -> fixed-width feature vector
ImageDecoder = Callable[[bytes], list[float]]


def decode_image(payload: bytes) -> list[float]:
    """Decode an image payload to a feature vector.

    Real implementation needs an image codec (Pillow/opencv), absent in
    this container — inject a decoder for tests or provide one at
    deployment (reference: this is the X2-style extension seam).
    """
    raise NotImplementedError(
        "image decode needs a codec library; inject decoder=... instead"
    )


def extract_features(
    media: DataFrame,
    decoder: ImageDecoder | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode payloads to feature vectors, partition-parallel.

    Payload stays executor-side; each Arrow batch is decoded in place.
    A None decoder uses the (stubbed) real one.
    """
    decode = decoder or decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p)) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def byte_histogram_features(media: DataFrame, buckets: int = 16) -> DataFrame:
    """Codec-free feature extraction that runs ANYWHERE: normalized byte
    histogram of the payload — pure Spark expressions over hex pairs
    (binary-safe, stays in codegen), no Python in the loop."""
    n = F.length("payload")  # byte count for binary columns
    width = 256 // buckets
    # binary -> array<int> of byte values via hex-pair parsing
    bytes_arr = F.expr(
        "transform(sequence(1, length(payload)),"
        " i -> cast(conv(substr(hex(payload), 2*i - 1, 2), 16, 10) as int))"
    )
    hist = F.array(
        *[
            (
                F.size(
                    F.filter(
                        bytes_arr, lambda b: (b / width).cast("int") == F.lit(i)
                    )
                )
                / n
            ).cast("double")
            for i in range(buckets)
        ]
    )
    return media.select(
        "media_id",
        "media_type",
        n.cast("long").alias("n_bytes"),
        hist.alias("features"),
    )


def frame_sample(
    media: DataFrame,
    every_ms: int,
    max_frames: int = 16,
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset.

    The frame *extraction* is part of the stubbed decode; the sampling
    plan (which offsets, per video, bounded fan-out) is engine logic:
    explode a bounded sequence — rows stay proportional to frames, not
    payload bytes.
    """
    n_frames = F.least(
        F.floor(F.col("duration_ms") / every_ms).cast("int") + 1,
        F.lit(max_frames),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_offset_ms",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * every_ms,
                )
            ),
        )
        .select("media_id", "frame_offset_ms", "duration_ms")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

# (payload, target_w, target_h) -> resized payload bytes
Resizer = Callable[[bytes, int, int], bytes]


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. Needs a codec library (absent here) —
    inject a resizer or provide one at deployment."""
    raise NotImplementedError(
        "image resize needs a codec library; inject resizer=... instead"
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Resizer | None = None,
) -> DataFrame:
    """Resize image payloads partition-parallel (Arrow-batched).

    The output schema records the target dimensions; payloads never
    touch the driver and each task holds one Arrow batch of them.
    """
    rs = resizer or resize_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                rs(bytes(p), width, height) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "payload")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )
