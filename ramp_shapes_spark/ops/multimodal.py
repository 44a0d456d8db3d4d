"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing here is real and tested — schemas, batch
shapes, partition behavior, deterministic fake features — while the
actual media decoding is stubbed: this container ships no image/audio
codecs, so ``decode_image``'s pixel path raises ``NotImplementedError``
unless ``fake=True``, which substitutes a deterministic
content-derived feature vector.  Swapping in PIL/torchaudio happens
inside the already-correct batch iterator.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),    # opaque bytes
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def synthesize_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    base = spark.range(0, n, 1, partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    return base.select(
        F.format_string("media%06d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(kind == "image", (32 + F.col("id") % 64).cast("int")).alias("width"),
        F.when(kind == "image", (32 + F.col("id") % 48).cast("int")).alias("height"),
        F.when(kind != "image", (F.col("id") * 250).cast("long")).alias("duration_ms"),
        F.encode(F.sha2(F.col("id").cast("string"), 256), "utf-8").alias("payload"),
    )


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    ``fake=True`` derives a deterministic unit vector from the payload
    hash (testable end-to-end); ``fake=False`` is the real-decoder
    hook and raises until codecs are provisioned.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "media decoding requires image/audio codecs; "
                        "install and replace this branch"
                    )
                digest = hashlib.sha256(data).digest()
                raw = np.frombuffer(
                    (digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                    dtype=np.uint32,
                ).astype(np.float64)
                vec = raw / np.linalg.norm(raw)
                rows.append((media_id, len(data),
                             [float(x) for x in vec.astype(np.float32)]))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "features"]
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned sample timestamp
    (pure relational expansion; the decode of each frame is the stubbed
    stage above)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("sample_ms"),
    )
