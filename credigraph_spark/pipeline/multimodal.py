"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is fully real — schemas, partition-preserving
``mapInPandas`` stages, Arrow batch shapes, typed metadata structs.
``decoder='real'`` parses real container headers (PNG / BMP / WAV widths,
heights, channels, sample rates) and derives a content feature from the
payload bytes — all dependency-free, so it runs in this container; full
pixel/sample decode of compressed codecs (JPEG, MP3, H.264) would slot
into the same ONE function when codec libraries are present.
``decoder='fake'`` remains the hash-derived deterministic stand-in for
pipeline tests that need stable values regardless of payload format.
Neither changes the distribution logic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),       # image | audio | video
    StructField("mime_type", StringType()),
    StructField("payload", StructType([          # typed metadata + bytes
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(DoubleType())),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def _fake_decode(data: bytes, dim: int = 8) -> tuple[list[float], int, int]:
    """Deterministic stand-in for a real codec: derive a feature vector and
    fake dimensions purely from the bytes (stable across partitionings)."""
    import hashlib

    h = hashlib.sha256(data).digest()
    feat = [int.from_bytes(h[i * 4:(i + 1) * 4], "big") / 2**32 for i in range(dim)]
    return feat, 16 + h[0] % 64, 16 + h[1] % 64


def _byte_feature(data: bytes, dim: int) -> list[float]:
    """Bucketed byte-mean feature over the payload — a real (content-derived)
    vector without codec libraries; each bucket is the mean byte value of an
    equal slice of the payload, normalized to [0, 1]."""
    n = len(data)
    if n == 0:
        return [0.0] * dim
    step = max(n // dim, 1)
    out = []
    for i in range(dim):
        chunk = data[i * step:(i + 1) * step] or data[-step:]
        out.append(sum(chunk) / (255.0 * len(chunk)))
    return out


def _real_decode(data: bytes, dim: int = 8) -> tuple[list[float], int, int]:
    """Dependency-free container parse for the three formats whose headers
    are fixed-offset (no codec library needed): PNG (IHDR width/height),
    BMP (BITMAPINFOHEADER width/|height|), WAV (fmt chunk — width carries
    n_channels, height carries sample_rate; documented overload so the one
    FEATURE_SCHEMA serves both modalities). The feature vector is the
    bucketed byte-mean of the payload past the parsed header. Undecodable
    bytes yield (zeros, -1, -1) — at 100 TB one malformed blob must flag
    the row, not kill the stage."""
    import struct

    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return _byte_feature(data[33:], dim), w, h
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            off = struct.unpack("<I", data[10:14])[0]
            return _byte_feature(data[off:], dim), w, abs(h)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            pos = 12
            while pos + 8 <= len(data):
                cid = data[pos:pos + 4]
                size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
                if cid == b"fmt " and size >= 16:
                    channels = struct.unpack("<H", data[pos + 10:pos + 12])[0]
                    rate = struct.unpack("<I", data[pos + 12:pos + 16])[0]
                    return _byte_feature(data[pos + 8 + size:], dim), channels, rate
                pos += 8 + size + (size & 1)
    except (struct.error, IndexError):
        pass
    return [0.0] * dim, -1, -1


def attach_binary_metadata(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Binary column -> typed metadata (JVM-side: length + sha2, no UDF)."""
    return df.withColumn("n_bytes", F.length(F.col(binary_col)).cast("long")) \
             .withColumn("sha256", F.sha2(F.col(binary_col), 256))


def extract_features(df: DataFrame, binary_col: str = "data",
                     id_col: str = "media_id", modality_col: str = "modality",
                     dim: int = 8, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas. Batches stream
    through the Python worker one Arrow batch at a time, so a 100 TB binary
    table never materializes per-executor; partitioning is inherited from
    the scan (no shuffle)."""
    if decoder == "real":
        decode = _real_decode
    elif decoder == "fake":
        decode = _fake_decode
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, ws, hs, nb = [], [], [], []
            for data in b[binary_col]:
                raw = bytes(data) if data is not None else b""
                f, w, h = decode(raw, dim)
                feats.append(f)
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
            yield pd.DataFrame({
                "media_id": b[id_col],
                "modality": b[modality_col],
                "n_bytes": pd.Series(nb, dtype="int64"),
                "feature": feats,
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str = "media_id",
                      n_frames: int = 4, duration_col: str | None = None) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_idx, t_offset) rows via
    a generator expression (posexplode over a sequence) — the decode of the
    planned frames is the stubbed step above."""
    dur = F.col(duration_col) if duration_col else F.lit(float(n_frames))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: i.cast("double") * dur / F.lit(n_frames),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(offsets).alias("frame_idx", "t_offset"),
    )
