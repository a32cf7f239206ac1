"""Multimodal-column battery: binary plumbing with SQL-expressible
oracles (byte-level ops on deterministic md5-derived blobs), plus the
mapInPandas feature-extraction path (rows-only check: numpy batch math
is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ._util import QueryDef, bint, tbl


def mm_binary_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque binary columns: length, hex round-trip, sha, first-byte
    histogram -- all JVM-side byte ops over the synthesized media blob."""
    d = M.attach_fake_media(tbl(spark, sf, "documents"), "doc_id")
    first_byte = F.conv(F.substring(F.hex("media"), 1, 2), 16, 10) \
        .cast("bigint")
    return (d.groupBy((first_byte % 16).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("media")).alias("total_bytes"),
        F.min(F.md5(F.lower(F.hex("media")))).alias("min_sig"))
        .orderBy("bucket"))


_MM_BINARY_SQL = """
WITH media AS (
  SELECT doc_id,
         from_hex(concat(md5(CAST(doc_id AS VARCHAR)),
                         md5(concat(CAST(doc_id AS VARCHAR), 'x')))) AS blob
  FROM documents)
SELECT CAST(concat('0x', substr(hex(blob), 1, 2)) AS BIGINT) % 16 AS bucket,
       COUNT(*) AS n,
       CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes,
       MIN(md5(lower(hex(blob)))) AS min_sig
FROM media GROUP BY 1 ORDER BY bucket
"""


def mm_media_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Typed metadata struct access (nested-field projection -- Catalyst
    prunes to the struct fields actually read)."""
    d = M.attach_fake_media(tbl(spark, sf, "documents"), "doc_id")
    return d.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        bint(F.col("media_meta.width")).alias("width"),
        bint(F.col("media_meta.height")).alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


_MM_META_SQL = """
SELECT doc_id, 'image' AS media_type,
       doc_id % 64 + 1 AS width,
       doc_id % 48 + 1 AS height,
       CAST(32 AS BIGINT) AS n_bytes
FROM documents
"""


def mm_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode -> feature extraction: each row carries an
    actual 24-bit BMP (built-in numpy codec, no external libs), decoded
    and reduced to row/col-mean features in an Arrow-batched
    mapInPandas stage. Pixel math is numpy-side, so the driver records
    the rows-only check for this one."""
    d = M.attach_bmp_media(
        tbl(spark, sf, "documents").where(F.col("doc_id") < 2000),
        "doc_id")
    feats = M.decode_features(d, use_real_codec=True)
    return (feats.select(
        "doc_id", "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 6)
        .alias("feature_sum"))
        .orderBy("doc_id"))


def mm_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Real WAV (RIFF PCM) decode -> duration/RMS/peak per row (built-in
    numpy codec). Sample synthesis is numpy-side: rows-only check."""
    d = M.attach_wav_media(
        tbl(spark, sf, "documents").where(F.col("doc_id") < 2000),
        "doc_id")
    return (M.audio_features(d)
            .select("doc_id", F.round("duration_sec", 6).alias("duration_sec"),
                    F.round("rms", 4).alias("rms"), "peak")
            .orderBy("doc_id"))


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Real video frame sampling end to end: MBMP clips (concatenated
    BMP frames, pure-numpy codec) attached per document, decoded and
    strided in a row-expanding mapInPandas, per-frame mean/std features
    aggregated per doc. Rows-only check (numpy batch math is not
    SQL-expressible)."""
    d = tbl(spark, sf, "documents").where(F.col("doc_id") < 200) \
        .select("doc_id")
    clips = M.attach_mbmp_media(d, "doc_id", n_frames=12)
    feats = M.frame_sample(clips, id_col="doc_id", every_n=4)
    return (feats.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.round(F.avg("mean_intensity"), 6).alias("avg_mean"),
                 F.round(F.max("std_intensity"), 6).alias("max_std"))
            .orderBy("doc_id"))


QUERIES: dict[str, QueryDef] = {
    "mm_frame_sample": QueryDef(mm_frame_sample, None),
    "mm_audio_features": QueryDef(mm_audio_features, None),
    "mm_binary_stats": QueryDef(mm_binary_stats, _MM_BINARY_SQL),
    "mm_media_metadata": QueryDef(mm_media_metadata, _MM_META_SQL),
    "mm_decode_features": QueryDef(mm_decode_features, None),
}
