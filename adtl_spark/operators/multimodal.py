"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing by byte budget, deterministic
fake decoders for tests.  The actual codec calls (PIL/ffmpeg/torchaudio)
are stubbed behind ``NotImplementedError`` — those libraries are not in
this container — with the batch shapes and UDF signatures they would use.

Design for 100 TB:
- binary payloads never pass through Python row-at-a-time; every decode /
  transform is an Arrow-batched ``mapInPandas`` over whole partitions;
- ``repartition_by_bytes`` sizes partitions by payload bytes (a fixed row
  count is wrong when blobs vary 1000x in size);
- metadata (width/height/duration/sample_rate) lives in typed columns so
  filters on it push down to parquet without touching payloads.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("entropy_estimate", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decoder stub: would be PIL.Image.open(io.BytesIO(payload)).
    The image/audio libraries are not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL; wire Image.open(io.BytesIO(payload)) here"
    )


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: dim floats derived
    from the payload's sha256 — stable across runs and partitionings, so
    pipelines downstream of the decoder are testable without codecs."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_image_features(
    df: DataFrame, use_real_decoder: bool = False, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas processes whole Arrow batches; the Python worker sees
    columnar buffers, never per-row pickling.  With ``use_real_decoder``
    the stub raises NotImplementedError by design.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "payload_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "entropy_estimate": payloads.map(_entropy_estimate),
                    "feature": payloads.map(
                        lambda b: (
                            decode_image(b) if use_real_decoder else fake_feature(b, dim)
                        )
                        if b is not None
                        else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def _entropy_estimate(payload: bytes | None) -> float | None:
    """Cheap compressibility proxy: deflate ratio (1.0 = incompressible).
    Useful as a corrupt-/blank-media filter without any codec."""
    if payload is None or len(payload) == 0:
        return None
    compressed = len(zlib.compress(payload, 1))
    return min(compressed / len(payload), 1.0)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    timestamp from the metadata duration — pure Column math; the actual
    frame grab is the stubbed decoder's job.  Demonstrates explode-based
    fan-out without touching payloads."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
    )


def repartition_by_bytes(
    df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Repartition so each partition carries ~target bytes of payload.
    Row-count partitioning breaks when payloads vary by orders of
    magnitude; this sizes by the real byte budget (one lightweight agg to
    estimate, then a hash repartition)."""
    total = df.agg(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n, "media_id")


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id, round-robin kinds, plausible metadata."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "image": (64 + i % 128, 64 + (i * 3) % 128, None, None),
            "audio": (None, None, 1000 * (1 + i % 30), 16000),
            "video": (320, 240, 1000 * (1 + i % 10), None),
        }[kind]
        rows.append((i, kind, payload, f"application/x-fake-{kind}", meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
