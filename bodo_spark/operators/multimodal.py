"""Multimodal (image/audio/video) column operators.

Design: media are opaque ``binary`` columns plus a typed metadata
struct -- the layout a 100 TB multimodal corpus actually uses (parquet
binary + sidecar fields; one row group streams one shard). The
Spark-side plumbing here is real and tested: schemas, partition-safe
mapInPandas batch shapes, Arrow transfer, deterministic fakes for the
pixel math. The actual codec calls are stubbed behind
``NotImplementedError`` because no image/audio libraries exist in this
container; swapping ``_decode_image_real`` for PIL/libvips turns the
fake path into the real one without touching any Spark code.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every media binary column
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image/audio/video
    T.StructField("format", T.StringType()),       # png/jpeg/wav/...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
])

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, key_col: str,
                      media_col: str = "media") -> DataFrame:
    """Synthesize a deterministic binary 'image' per row (md5-chain of
    the key) + metadata struct. Stands in for spark.read.format(
    'binaryFile') over a real media lake; everything downstream treats
    it as opaque bytes."""
    blob = F.unhex(F.concat(
        F.md5(F.col(key_col).cast("string")),
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("x")))))
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        (F.col(key_col) % 64 + 1).cast("int").alias("width"),
        (F.col(key_col) % 48 + 1).cast("int").alias("height"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha"),
    )
    return (df.withColumn(media_col, blob)
            .withColumn(f"{media_col}_meta", meta))


def _decode_image_real(data: bytes, fmt: str) -> "np.ndarray":
    raise NotImplementedError(
        "image codecs are not available in this container; plug PIL/"
        "libvips here -- the Spark plumbing (schema, batching, Arrow "
        "transfer) is identical for the real decoder")


def _decode_image_fake(data: bytes) -> np.ndarray:
    """Deterministic stand-in decode: bytes -> pseudo-pixel grid."""
    h = hashlib.sha256(data).digest()
    arr = np.frombuffer((h * 8)[:256], dtype=np.uint8)
    return arr.reshape(16, 16)


def decode_features(df: DataFrame, media_col: str = "media",
                    id_col: str = "doc_id",
                    use_real_codec: bool = False) -> DataFrame:
    """media binary -> FEATURE_DIM float feature vector, via Arrow-
    batched mapInPandas (the only Python hop; everything before/after
    stays JVM-side). Output schema: (id, n_bytes, features)."""

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            feats, sizes = [], []
            for data in pdf[media_col]:
                raw = bytes(data)
                sizes.append(len(raw))
                if use_real_codec:
                    img = _decode_image_real(raw, "fake")  # pragma: no cover
                else:
                    img = _decode_image_fake(raw)
                # 16x16 -> row/col means -> FEATURE_DIM floats in [0,1)
                f = np.concatenate([img.mean(axis=0)[:8], img.mean(axis=1)[:8]])
                feats.append((f / 255.0).astype(np.float32))
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "n_bytes": np.asarray(sizes, dtype=np.int64),
                "features": feats,
            })

    return df.select(id_col, media_col).mapInPandas(batches, out_schema)


def resize_stub(df: DataFrame, media_col: str = "media",
                width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: passes bytes through a mapInPandas stage and
    rewrites the metadata dims (real resize = swap the inner fn)."""
    meta_col = f"{media_col}_meta"
    return df.withColumn(
        meta_col,
        F.col(meta_col).withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int")))


def frame_sample_stub(df: DataFrame, media_col: str = "media",
                      every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_no, frame_bytes)
    rows -- here one deterministic fake frame per media row."""
    return df.select(
        "*", F.explode(F.array(F.lit(0))).alias("frame_no"),
        F.sha2(F.col(media_col), 256).alias("frame_sig"))
