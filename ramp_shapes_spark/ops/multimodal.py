"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

Two decode tiers:

* **Real decode** — uncompressed formats need no native codecs, so BMP
  (24-bit ``BI_RGB``) and PPM (binary ``P6``) are decoded in pure
  Python/NumPy inside the Arrow batch iterator: ``decode_images`` is a
  first-class distributed op, and ``extract_features(fake=False)``
  computes genuine pixel features (downsampled luminance grid).
* **Stub tier** — compressed formats (JPEG/PNG/audio/video) would need
  codec libraries this container doesn't ship; payloads that aren't
  BMP/PPM raise ``NotImplementedError`` with a clear message.  Swapping
  in PIL/torchaudio happens inside the already-correct batch iterator.
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


# --------------------------------------------------------------------
# pure-Python codecs for uncompressed formats (no native libs needed)
# --------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP from an (H, W, 3) uint8 RGB array.

    Rows are padded to 4-byte strides and stored bottom-up with BGR
    channel order, per the Windows BITMAPINFOHEADER spec."""
    h, w, _ = pixels.shape
    stride = (3 * w + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    size = 54 + h * stride
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")                    # BI_RGB
        + (h * stride).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body.tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary P6 PPM from an (H, W, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from BMP (24-bit BI_RGB) or PPM (P6) bytes.

    Other magics raise ``NotImplementedError`` — compressed formats
    need codec libraries this container doesn't provision."""
    if data[:2] == b"BM":
        off = int.from_bytes(data[10:14], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB "
                "is decoded natively")
        flip = h > 0          # positive height = bottom-up rows
        h = abs(h)
        stride = (3 * w + 3) // 4 * 4
        rows = np.frombuffer(
            data[off: off + h * stride], dtype=np.uint8
        ).reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]                         # BGR -> RGB
        return (rgb[::-1] if flip else rgb).copy()
    if data[:2] == b"P6":
        # header: magic, width, height, maxval — whitespace/comment
        # separated, then a single whitespace byte before the raster
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos] in b" \t\r\n":
                pos += 1
            if pos < len(data) and data[pos: pos + 1] == b"#":
                while pos < len(data) and data[pos] not in b"\r\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and data[pos] not in b" \t\r\n":
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1
        w, h, maxval = fields
        if maxval != 255:
            raise NotImplementedError("PPM maxval != 255")
        return np.frombuffer(
            data[pos: pos + 3 * w * h], dtype=np.uint8
        ).reshape(h, w, 3).copy()
    raise NotImplementedError(
        "payload is neither BMP nor PPM; compressed formats require "
        "image codecs — install and extend decode_image")


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, 3) array (pure NumPy)."""
    h, w, _ = pixels.shape
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return pixels[ys][:, xs]


def _grid_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Luminance downsampled to a sqrt(dim)² grid, L2-normalized."""
    side = max(int(dim ** 0.5), 1)
    lum = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    grid = resize_nearest(
        np.repeat(lum[:, :, None], 3, axis=2).astype(np.float64),
        side, side)[:, :, 0].reshape(-1)
    vec = np.zeros(dim)
    vec[: grid.size] = grid
    n = np.linalg.norm(vec)
    return vec / n if n else vec


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    ``fake=True`` derives a deterministic unit vector from the payload
    hash (no decode); ``fake=False`` REALLY decodes each payload
    (BMP/PPM natively — see ``decode_image``) and emits a downsampled
    luminance-grid feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not fake:
                    vec = _grid_features(decode_image(data), dim)
                else:
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


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("fmt", StringType(), False),        # bmp|ppm
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sum_lum", LongType(), False),      # exact Σ green
    ]
)


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """Real encoded image payloads derived deterministically from the
    ``documents`` table: doc_id picks dimensions (w = 16 + id % 49,
    h = 16 + id % 33) and format (even id → BMP, odd → PPM); pixel
    (x, y) is the gray value x + y, so every decoded statistic has a
    closed form an SQL oracle can state exactly.

    Encoding runs distributed in the Arrow batch iterator — each
    partition encodes only its own rows."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 49, 16 + d % 33
                lum = (np.arange(h)[:, None] + np.arange(w)[None, :])
                px = np.repeat(
                    lum.astype(np.uint8)[:, :, None], 3, axis=2)
                data = encode_bmp(px) if d % 2 == 0 else encode_ppm(px)
                rows.append((f"img{d}", "image",
                             "image/bmp" if d % 2 == 0 else "image/x-ppm",
                             w, h, None, data))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select("doc_id").mapInPandas(enc, MEDIA_SCHEMA)


def decode_images(media: DataFrame) -> DataFrame:
    """Distributed REAL decode of BMP/PPM payloads: dimensions, byte
    size, and the exact integer sum of the green channel — every value
    re-derivable by an SQL oracle from the synthesis rule, so this op
    has a full value-level correctness gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload)
                px = decode_image(data)
                h, w, _ = px.shape
                rows.append((
                    media_id,
                    "bmp" if data[:2] == b"BM" else "ppm",
                    w, h, len(data),
                    int(px[:, :, 1].astype(np.int64).sum()),
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA])

    return media.select("media_id", "payload").mapInPandas(run, DECODE_SCHEMA)


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
