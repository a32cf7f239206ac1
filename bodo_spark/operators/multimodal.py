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

from ..plans import ensure_scan_width

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
    """Real decode: BMP handled natively (pure numpy, below); other
    formats need the absent image libraries."""
    if fmt == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        "only the built-in BMP codec is available in this container; "
        "plug PIL/libvips here for jpeg/png -- the Spark plumbing "
        "(schema, batching, Arrow transfer) is identical")


# -- built-in BMP codec (24-bit uncompressed, BITMAPINFOHEADER): a REAL
# image format implemented with numpy alone, so the decode path is
# exercised end-to-end without external libraries.

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes (rows bottom-up, BGR, 4-byte
    padded)."""
    import struct
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += pixels[y, :, ::-1].tobytes()  # BGR order
        body += b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Supports the 24-bit
    uncompressed BITMAPINFOHEADER layout written by encode_bmp (and by
    most tools' default export)."""
    import struct
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, "
                         f"compression={comp})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        line = np.frombuffer(data, dtype=np.uint8,
                             count=row, offset=offset + i * stride)
        y = h - 1 - i if flip else i
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# -- built-in WAV codec (RIFF PCM 16-bit): the audio twin of the BMP
# path -- real format, numpy only. Video remains a seam (no container
# parsers without libraries).

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 mono PCM -> WAV bytes."""
    import struct
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ",
        16, 1, 1, rate, rate * 2, 2, 16, b"data", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, sample_rate). PCM 16-bit mono/stereo
    (stereo is flattened interleaved)."""
    import struct
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos = 12
    rate, bits = None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            fmt, _ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, pos + 8)
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            samples = np.frombuffer(data, dtype="<i2",
                                    count=size // 2, offset=pos + 8)
            return samples, rate
        pos += 8 + size + (size % 2)
    raise ValueError("no data chunk")


def audio_features(df: DataFrame, media_col: str = "media",
                   id_col: str = "doc_id") -> DataFrame:
    """Real WAV decode -> (duration_sec, rms, peak) per row, Arrow-
    batched."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for k, data in zip(pdf[id_col], pdf[media_col]):
                s, rate = decode_wav(bytes(data))
                x = s.astype(np.float64)
                rows.append((k, len(s) / rate,
                             float(np.sqrt((x * x).mean())) if len(s) else 0.0,
                             int(np.abs(s).max()) if len(s) else 0))
            yield pd.DataFrame(rows, columns=[id_col, "duration_sec",
                                              "rms", "peak"])

    return ensure_scan_width(df.select(id_col, media_col)) \
        .mapInPandas(run, out_schema)


def attach_wav_media(df: DataFrame, key_col: str,
                     media_col: str = "media",
                     n_samples: int = 256, rate: int = 16000) -> DataFrame:
    """Deterministic real WAV per row (int16 noise seeded from the key)."""
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField(media_col, T.BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for k in pdf[key_col]:
                seed = hashlib.sha256(str(k).encode()).digest()
                raw = np.frombuffer(
                    (seed * (n_samples // 16 + 1))[:n_samples * 2],
                    dtype="<i2")
                blobs.append(encode_wav(raw, rate))
            pdf = pdf.copy()
            pdf[media_col] = blobs
            yield pdf

    return df.mapInPandas(gen, schema)


def attach_bmp_media(df: DataFrame, key_col: str,
                     media_col: str = "media",
                     width: int = 8, height: int = 6) -> DataFrame:
    """Real-format twin of attach_fake_media: a deterministic 24-bit BMP
    per row (pixels seeded from the key), built in Arrow batches."""
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField(media_col, T.BinaryType()),
        T.StructField(f"{media_col}_meta", MEDIA_META_SCHEMA)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for k in pdf[key_col]:
                need = width * height * 3
                reps = -(-need // 32)  # ceil over the 32-byte digest
                rng = np.frombuffer(
                    hashlib.sha256(str(k).encode()).digest() * reps,
                    dtype=np.uint8)[:need]
                px = rng.reshape(height, width, 3)
                b = encode_bmp(px)
                blobs.append(b)
                metas.append({"media_type": "image", "format": "bmp",
                              "width": width, "height": height,
                              "n_bytes": len(b),
                              "sha": hashlib.sha256(b).hexdigest()})
            pdf = pdf.copy()
            pdf[media_col] = blobs
            pdf[f"{media_col}_meta"] = metas
            yield pdf

    return df.mapInPandas(gen, schema)


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
                    # built-in BMP codec: a real decode, no libraries
                    img = _decode_image_real(raw, "bmp").mean(axis=2)
                else:
                    img = _decode_image_fake(raw)
                # grid -> row/col means -> FEATURE_DIM floats in [0,1)
                f = np.concatenate([img.mean(axis=0)[:8], img.mean(axis=1)[:8]])
                if len(f) < FEATURE_DIM:
                    f = np.pad(f, (0, FEATURE_DIM - len(f)))
                feats.append((f / 255.0).astype(np.float32))
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "n_bytes": np.asarray(sizes, dtype=np.int64),
                "features": feats,
            })

    # decode work is per-ROW; a 1-file scan must not serialize it
    return ensure_scan_width(df.select(id_col, media_col)) \
        .mapInPandas(batches, out_schema)


def resize_stub(df: DataFrame, media_col: str = "media",
                width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: passes bytes through a mapInPandas stage and
    rewrites the metadata dims (real resize = swap the inner fn)."""
    meta_col = f"{media_col}_meta"
    return df.withColumn(
        meta_col,
        F.col(meta_col).withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int")))


def resize_images(df: DataFrame, media_col: str = "media",
                  width: int = 16, height: int = 12) -> DataFrame:
    """REAL image resize over BMP blobs (nearest-neighbor in numpy):
    decode -> index-sample -> re-encode, metadata dims/bytes/sha
    rewritten to the new payload. Arrow-batched; compressed formats
    keep the resize_stub seam."""
    meta_col = f"{media_col}_meta"
    schema = df.schema

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            blobs, metas = [], []
            for data, meta in zip(pdf[media_col], pdf[meta_col]):
                px = decode_bmp(bytes(data))
                h, w, _ = px.shape
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                out = encode_bmp(px[yi][:, xi])
                blobs.append(out)
                m = dict(meta)
                m.update(width=width, height=height, n_bytes=len(out),
                         sha=hashlib.sha256(out).hexdigest())
                metas.append(m)
            pdf = pdf.copy()
            pdf[media_col] = blobs
            pdf[meta_col] = metas
            yield pdf

    return df.mapInPandas(run, schema)


def frame_sample_stub(df: DataFrame, media_col: str = "media",
                      every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_no, frame_bytes)
    rows -- here one deterministic fake frame per media row."""
    return df.select(
        "*", F.explode(F.array(F.lit(0))).alias("frame_no"),
        F.sha2(F.col(media_col), 256).alias("frame_sig"))


# -- built-in raw video container (MBMP: concatenated 24-bit BMP
# frames behind a tiny length-prefixed header) -- the video twin of the
# BMP/WAV paths: a REAL parseable format in pure numpy/struct, so frame
# sampling runs end to end. Compressed containers (mp4/mkv) remain an
# honest seam: no codec libraries in this container.

def encode_mbmp(frames: "list[np.ndarray]") -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> MBMP bytes:
    b'MBMP' + u32 frame count + u32 per-frame lengths + BMP payloads."""
    import struct
    payloads = [encode_bmp(f) for f in frames]
    head = struct.pack("<4sI", b"MBMP", len(payloads))
    lens = struct.pack(f"<{len(payloads)}I", *[len(p) for p in payloads])
    return head + lens + b"".join(payloads)


def decode_mbmp(data: bytes) -> "list[np.ndarray]":
    """MBMP bytes -> list of (h, w, 3) uint8 RGB frames."""
    import struct
    if data[:4] != b"MBMP":
        raise ValueError("not an MBMP stream")
    (n,) = struct.unpack_from("<I", data, 4)
    lens = struct.unpack_from(f"<{n}I", data, 8)
    out, pos = [], 8 + 4 * n
    for ln in lens:
        out.append(decode_bmp(data[pos:pos + ln]))
        pos += ln
    return out


def attach_mbmp_media(df: DataFrame, key_col: str,
                      media_col: str = "media", n_frames: int = 12,
                      width: int = 8, height: int = 6) -> DataFrame:
    """Deterministic real MBMP clip per row (frame pixels seeded from
    (key, frame_no)), built in Arrow batches."""
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField(media_col, T.BinaryType()),
        T.StructField(f"{media_col}_meta", MEDIA_META_SCHEMA)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for k in pdf[key_col]:
                frames = []
                for i in range(n_frames):
                    rng = np.frombuffer(
                        hashlib.sha256(f"{k}:{i}".encode()).digest() * 6,
                        dtype=np.uint8)[:width * height * 3]
                    frames.append(rng.reshape(height, width, 3))
                b = encode_mbmp(frames)
                blobs.append(b)
                metas.append({"media_type": "video", "format": "mbmp",
                              "width": width, "height": height,
                              "n_bytes": len(b),
                              "sha": hashlib.sha256(b).hexdigest()})
            pdf = pdf.copy()
            pdf[media_col] = blobs
            pdf[f"{media_col}_meta"] = metas
            yield pdf

    return df.mapInPandas(gen, schema)


def frame_sample(df: DataFrame, media_col: str = "media",
                 id_col: str = "doc_id", every_n: int = 4) -> DataFrame:
    """REAL video frame sampling over MBMP clips: decode the container,
    keep every ``every_n``-th frame, emit one row per sampled frame with
    per-frame mean/std features -- row-expanding mapInPandas, the
    decode-heavy stage a training pipeline fans out on."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for k, data in zip(pdf[id_col], pdf[media_col]):
                for i, frame in enumerate(decode_mbmp(bytes(data))):
                    if i % every_n:
                        continue
                    x = frame.astype(np.float64)
                    rows.append((k, i, float(x.mean()), float(x.std())))
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_no", "mean_intensity", "std_intensity"])

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# perceptual image hashing + Hamming-banded near-dup (the multimodal
# dedup story: every image/frame corpus pipeline dedups perceptually --
# re-encodes, crops, brightness shifts survive where sha256 does not)

def _gray(px: "np.ndarray") -> "np.ndarray":
    """(h, w, 3) uint8 -> float64 channel mean. Exact arithmetic: the
    integer channel sum is exact and the single /3.0 is one IEEE
    division, so the DuckDB oracle reproduces every value bit-for-bit
    (no luma weights -- 0.299R+0.587G+0.114B would be three roundings
    whose order engines disagree on)."""
    return px.sum(axis=2, dtype=np.float64) / 3.0


def _box_resize(gray: "np.ndarray", th: int, tw: int) -> "np.ndarray":
    """Integer-boundary box-mean downscale (area averaging): cell (i,j)
    averages source rows [i*h//th, (i+1)*h//th) x cols alike. The
    identity when (th, tw) == gray.shape -- the gate runs at identity
    so the oracle needs no mean-fold parity."""
    h, w = gray.shape
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    out = np.empty((th, tw), dtype=np.float64)
    for i in range(th):
        # upscale cells can get an empty [ys[i], ys[i+1]) range --
        # clamp to one source pixel (nearest-replicate)
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(tw):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = gray[y0:y1, x0:x1].mean()
    return out


def _bits_to_i64(bits: "np.ndarray") -> int:
    """Flat boolean array (<= 64) -> signed int64, bit i = bits[i]
    (two's complement wraparound for bit 63)."""
    v = np.uint64(0)
    for i, b in enumerate(bits.ravel()):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(np.int64(v))


def image_dhash(df: DataFrame, media_col: str = "media",
                id_col: str = "doc_id", out_col: str = "dhash",
                hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """dHash (difference hash): grayscale, box-resize to
    (hash_h, hash_w + 1), bit (y, x) = gray[y][x] > gray[y][x+1] --
    ``hash_w * hash_h`` bits packed into an int64. Robust to uniform
    brightness/contrast shifts (comparisons are relative); pair it with
    dedup.hamming_fp_pairs for banded near-dup candidate generation.
    One Arrow-batched mapInPandas stage; everything after is JVM."""
    if hash_w * hash_h > 64:
        raise ValueError("dhash must fit in 64 bits")
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            vals = []
            for data in pdf[media_col]:
                g = _gray(decode_bmp(bytes(data)))
                g = _box_resize(g, hash_h, hash_w + 1)
                vals.append(_bits_to_i64(g[:, :-1] > g[:, 1:]))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                out_col: np.asarray(vals, dtype=np.int64)})

    return ensure_scan_width(df.select(id_col, media_col)) \
        .mapInPandas(batches, out_schema)


def image_phash(df: DataFrame, media_col: str = "media",
                id_col: str = "doc_id", out_col: str = "phash",
                grid: int = 32, keep: int = 8) -> DataFrame:
    """pHash (DCT hash): grayscale, box-resize to grid x grid,
    orthonormal 2-D DCT-II, keep the low-frequency keep x keep block,
    bit i = coefficient > median (DC excluded from the median, as in
    the original pHash). More robust than dHash to blur/resampling.

    NOT oracle-gated: the DCT is a float matmul whose summation order
    differs between BLAS and any SQL re-derivation, and bits exactly at
    the median are ulp-sensitive -- cross-engine bit stability cannot
    be guaranteed. Engine-internal determinism (same bytes -> same
    hash, perturbation-invariance) is pinned by unit tests instead;
    near-dup pairing reuses the same hamming_fp_pairs machinery."""
    n = grid
    k = np.arange(n)
    # orthonormal DCT-II basis: B[u, x] = c(u) cos(pi (2x+1) u / 2n)
    B = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    B[0, :] *= np.sqrt(1.0 / n)
    B[1:, :] *= np.sqrt(2.0 / n)
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            vals = []
            for data in pdf[media_col]:
                g = _box_resize(_gray(decode_bmp(bytes(data))), n, n)
                d = (B @ g @ B.T)[:keep, :keep].ravel()
                # round before thresholding: structurally-zero AC
                # coefficients (flat or axis-periodic images) carry
                # ~1e-15 matmul noise, and thresholding raw noise
                # against the median makes their bits random
                d = np.round(d, 6)
                med = np.median(d[1:])
                vals.append(_bits_to_i64(d > med))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                out_col: np.asarray(vals, dtype=np.int64)})

    return ensure_scan_width(df.select(id_col, media_col)) \
        .mapInPandas(batches, out_schema)


def audio_fingerprint(df: DataFrame, media_col: str = "media",
                      id_col: str = "doc_id", out_col: str = "afp",
                      n_bits: int = 64, mode: str = "energy") -> DataFrame:
    """Perceptual audio fingerprint -> int64, for Hamming-banded
    near-dup pairing (dedup.hamming_fp_pairs) -- the audio twin of
    image_dhash.

    ``mode='energy'``: the Haitsma-Kalker (2002, "A Highly Robust
    Audio Fingerprint System") sign-of-difference bit rule applied to
    consecutive TIME-segment energies: the clip is cut into
    ``n_bits + 1`` equal segments, E(m) = sum(x^2) over segment m
    (EXACT int64 arithmetic on int16 PCM -- no float, no rounding
    discipline needed, so a SQL oracle reproduces every bit), and
    bit m = E(m) > E(m+1). Robust to uniform gain (comparisons are
    relative) and to few-sample perturbations (only the touched
    segment's bits can flip).

    ``mode='spectral'``: the same bit rule over an 8-band rfft
    filterbank per segment (bit (s, b) = band energy difference sign
    across both band and time, the paper's actual 2-D rule) --
    float-DSP, so no SQL oracle; pinned by unit invariants
    (determinism, gain invariance, perturbation tolerance).

    One Arrow-batched mapInPandas stage; everything downstream
    (banding, pairing, verification) is JVM."""
    if not 2 <= n_bits <= 64:
        raise ValueError("n_bits must be in [2, 64]")
    if mode == "spectral" and n_bits % 8:
        # the 2-D rule emits 8 bits per segment row; a non-multiple
        # would silently truncate to (n_bits//8)*8 bits and weaken the
        # downstream Hamming-band pigeonhole guarantee
        raise ValueError("mode='spectral' needs n_bits % 8 == 0, "
                         f"got {n_bits}")
    segs = n_bits + 1
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.LongType()),
    ])

    def energy_bits(x: "np.ndarray") -> "np.ndarray":
        L = len(x) // segs
        if L < 1:
            raise ValueError(f"clip too short: {len(x)} samples for "
                             f"{segs} segments")
        seg = x[:L * segs].astype(np.int64).reshape(segs, L)
        e = (seg * seg).sum(axis=1)
        return e[:-1] > e[1:]

    def spectral_bits(x: "np.ndarray") -> "np.ndarray":
        # 2-D sign rule: EB(s,b) = band energy; bit = (EB(s,b)-EB(s,b+1))
        #               - (EB(s-1,b)-EB(s-1,b+1)) > 0
        n_seg = n_bits // 8 + 1
        L = len(x) // n_seg
        seg = x[:L * n_seg].astype(np.float64).reshape(n_seg, L)
        spec = np.abs(np.fft.rfft(seg, axis=1)) ** 2
        # 9 bands -> 8 differences per segment row
        edges = np.linspace(0, spec.shape[1], 10).astype(int)
        eb = np.stack([spec[:, a:b].sum(axis=1)
                       for a, b in zip(edges[:-1], edges[1:])], axis=1)
        d = eb[:, :-1] - eb[:, 1:]
        return (d[1:] - d[:-1] > 0).ravel()[:n_bits]

    bit_fn = energy_bits if mode == "energy" else spectral_bits

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            vals = []
            for data in pdf[media_col]:
                x, _rate = decode_wav(bytes(data))
                vals.append(_bits_to_i64(bit_fn(x)))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                out_col: np.asarray(vals, dtype=np.int64)})

    return ensure_scan_width(df.select(id_col, media_col)) \
        .mapInPandas(batches, out_schema)


def perturb_samples(df: DataFrame, media_col: str = "media",
                    delta: int = 17, idx: int = 0) -> DataFrame:
    """Decode WAV -> saturating-add ``delta`` to sample ``idx`` ->
    re-encode: the audio 'augmented twin' (perturb_pixels' WAV
    counterpart). Only the touched segment's fingerprint bits can
    flip, so a planted twin lands at small Hamming distance."""
    cols = list(df.columns)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            blobs = []
            for data in pdf[media_col]:
                x, rate = decode_wav(bytes(data))
                x = x.copy()
                x[idx] = np.int16(min(32767, int(x[idx]) + delta))
                blobs.append(encode_wav(x, rate))
            pdf = pdf.copy()
            pdf[media_col] = blobs
            yield pdf

    return df.mapInPandas(batches, df.schema)


def perturb_pixels(df: DataFrame, media_col: str = "media",
                   delta: int = 17, px: int = 0) -> DataFrame:
    """Decode -> saturating-add ``delta`` to channel 0 of flat pixel
    ``px`` -> re-encode: the minimal deterministic 'augmented twin'
    (a one-pixel brightness nudge). Exercises the full BMP
    decode->modify->encode round trip; used to plant perceptual
    near-dups the sha256 fingerprint can NOT match."""
    meta_col = f"{media_col}_meta"
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            blobs = []
            for data in pdf[media_col]:
                img = decode_bmp(bytes(data))
                h, w, _ = img.shape
                y, x = divmod(px, w)
                img = img.copy()
                img[y, x, 0] = min(255, int(img[y, x, 0]) + delta)
                blobs.append(encode_bmp(img))
            pdf = pdf.copy()
            pdf[media_col] = blobs
            if meta_col in pdf.columns:
                pdf[meta_col] = [
                    {**(m if isinstance(m, dict) else m.asDict()),
                     "n_bytes": len(b),
                     "sha": hashlib.sha256(b).hexdigest()}
                    for m, b in zip(pdf[meta_col], blobs)]
            yield pdf

    return df.mapInPandas(batches, df.schema)
