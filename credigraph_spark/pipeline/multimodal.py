"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is fully real — schemas, partition-preserving
``mapInPandas`` stages, Arrow batch shapes, typed metadata structs — while
the actual codec step is STUBBED (``decoder='fake'`` produces a
deterministic feature vector from the bytes; ``decoder='real'`` raises
``NotImplementedError`` because no image/audio libraries exist in this
container). Swapping in a real decoder changes ONE function, none of the
distribution logic.
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
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not present "
            "in this container; use decoder='fake' for pipeline testing"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, ws, hs, nb = [], [], [], []
            for data in b[binary_col]:
                raw = bytes(data) if data is not None else b""
                f, w, h = _fake_decode(raw, dim)
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
