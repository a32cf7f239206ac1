"""Multimodal-column battery: binary plumbing AND the mapInPandas
codec/feature paths, all with full value oracles -- the synthetic
media are sha256/md5-seeded, so DuckDB re-derives samples and pixels
in hex-string space and recomputes every feature the numpy codecs
produce."""

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
    mapInPandas stage. FULL value oracle: the BMP pixels are
    sha256(doc_id)-seeded, so DuckDB re-derives them in hex-string
    space and recomputes the row/col-mean features (incl. the float32
    quantization) -- the encode->decode->feature path is hash-checked
    end to end."""
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


# attach_bmp_media synthesis twin: 8x6 BMP whose 144 RGB bytes are
# (sha256(str(k)) digest * 6)[:144]; img = per-pixel channel mean;
# features = float32((col means ++ row means) / 255), padded to 16;
# n_bytes = 54-byte header + 6 rows * 24 bytes = 198.
_COLSUM = " + ".join(f"px[{r}*8+c+1]" for r in range(6))
_ROWSUM = " + ".join(f"px[r*8+{c}]" for c in range(1, 9))
_MM_DECODE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
s AS (SELECT doc_id, repeat(sha256(CAST(doc_id AS VARCHAR)), 6) AS h FROM d),
b AS (SELECT doc_id, list_transform(range(0, 144), j ->
        CAST(CAST(concat('0x', substr(h, j*2+1, 2)) AS INT) AS DOUBLE))
        AS bs FROM s),
img AS (SELECT doc_id, list_transform(range(0, 48), p ->
        (bs[p*3+1] + bs[p*3+2] + bs[p*3+3]) / 3.0) AS px FROM b),
feat AS (SELECT doc_id,
  list_transform(range(0, 8), c ->
      CAST(CAST(({_COLSUM}) / 6.0 / 255.0 AS REAL) AS DOUBLE)) AS colf,
  list_transform(range(0, 6), r ->
      CAST(CAST(({_ROWSUM}) / 8.0 / 255.0 AS REAL) AS DOUBLE)) AS rowf
  FROM img)
SELECT doc_id, CAST(198 AS BIGINT) AS n_bytes,
       round(list_sum(colf) + list_sum(rowf), 6) AS feature_sum
FROM feat ORDER BY doc_id
"""


def mm_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Real WAV (RIFF PCM) decode -> duration/RMS/peak per row (built-in
    numpy codec). FULL value oracle: the synthetic samples are
    sha256(doc_id)-seeded int16s, so DuckDB re-derives every sample in
    hex-string space (substr over repeat(sha256(...))) and recomputes
    rms/peak/duration exactly -- the mapInPandas decode path is
    hash-checked end to end, not rows-only."""
    d = M.attach_wav_media(
        tbl(spark, sf, "documents").where(F.col("doc_id") < 2000),
        "doc_id")
    return (M.audio_features(d)
            .select("doc_id", F.round("duration_sec", 6).alias("duration_sec"),
                    F.round("rms", 4).alias("rms"),
                    F.col("peak").cast("bigint").alias("peak"))
            .orderBy("doc_id"))


# attach_wav_media synthesis twin: samples = frombuffer((sha256(str(k))
# digest * 17)[:512], '<i2'); 256 samples at 16 kHz. Byte i of the blob
# is hex pair i of repeat(sha256_hex, 17); int16 LE with two's
# complement spelled out.
_MM_AUDIO_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
s AS (SELECT doc_id, repeat(sha256(CAST(doc_id AS VARCHAR)), 17) AS h FROM d),
samp AS (SELECT doc_id, list_transform(range(0, 256), i ->
    CASE WHEN CAST(concat('0x', substr(h, (i*2+1)*2+1, 2)) AS INT) >= 128
         THEN CAST(concat('0x', substr(h, i*4+1, 2)) AS INT)
              + 256*CAST(concat('0x', substr(h, (i*2+1)*2+1, 2)) AS INT)
              - 65536
         ELSE CAST(concat('0x', substr(h, i*4+1, 2)) AS INT)
              + 256*CAST(concat('0x', substr(h, (i*2+1)*2+1, 2)) AS INT)
    END) AS xs FROM s)
SELECT doc_id, CAST(256 AS DOUBLE) / 16000 AS duration_sec,
       round(sqrt(list_avg(list_transform(xs,
           x -> CAST(x AS DOUBLE) * x))), 4) AS rms,
       CAST(list_max(list_transform(xs, x -> abs(x))) AS BIGINT) AS peak
FROM samp ORDER BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Real video frame sampling end to end: MBMP clips (concatenated
    BMP frames, pure-numpy codec) attached per document, decoded and
    strided in a row-expanding mapInPandas, per-frame mean/std features
    aggregated per doc. FULL value oracle: frame pixels are
    sha256(f"{k}:{i}")-seeded uint8s, so DuckDB re-derives every pixel
    in hex-string space and recomputes the per-frame mean/std -- the
    decode+stride+feature path is hash-checked end to end."""
    d = tbl(spark, sf, "documents").where(F.col("doc_id") < 200) \
        .select("doc_id")
    clips = M.attach_mbmp_media(d, "doc_id", n_frames=12)
    feats = M.frame_sample(clips, id_col="doc_id", every_n=4)
    return (feats.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.round(F.avg("mean_intensity"), 6).alias("avg_mean"),
                 F.round(F.max("std_intensity"), 6).alias("max_std"))
            .orderBy("doc_id"))


# attach_mbmp_media synthesis twin: frame pixels = frombuffer(
# (sha256(f"{k}:{i}") digest * 6), uint8)[:144]; every_n=4 over 12
# frames keeps frames 0/4/8; numpy .std() is the population std.
_MM_FRAME_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
f AS (SELECT doc_id, unnest([0, 4, 8]) AS frame_no FROM d),
s AS (SELECT doc_id, frame_no,
        repeat(sha256(concat(CAST(doc_id AS VARCHAR), ':',
                             CAST(frame_no AS VARCHAR))), 6) AS h
      FROM f),
px AS (SELECT doc_id, frame_no, list_transform(range(0, 144), j ->
         CAST(CAST(concat('0x', substr(h, j*2+1, 2)) AS INT) AS DOUBLE))
         AS xs FROM s),
m AS (SELECT doc_id, frame_no, xs, list_avg(xs) AS mu FROM px),
feat AS (SELECT doc_id, mu AS mean_i,
                sqrt(list_avg(list_transform(xs,
                    x -> (x - mu) * (x - mu)))) AS std_i
         FROM m)
SELECT doc_id, COUNT(*) AS n_frames,
       round(avg(mean_i), 6) AS avg_mean,
       round(max(std_i), 6) AS max_std
FROM feat GROUP BY doc_id ORDER BY doc_id
"""


QUERIES: dict[str, QueryDef] = {
    "mm_frame_sample": QueryDef(mm_frame_sample, _MM_FRAME_SQL),
    "mm_audio_features": QueryDef(mm_audio_features, _MM_AUDIO_SQL),
    "mm_binary_stats": QueryDef(mm_binary_stats, _MM_BINARY_SQL),
    "mm_media_metadata": QueryDef(mm_media_metadata, _MM_META_SQL),
    "mm_decode_features": QueryDef(mm_decode_features, _MM_DECODE_SQL),
}


def mm_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image near-dup (operators/multimodal.image_dhash +
    dedup.hamming_fp_pairs): the corpus gets one 9x8 BMP per doc plus a
    perturbed twin (one-pixel brightness nudge through a full BMP
    decode->modify->encode round trip) for every 5th doc -- twins the
    sha256 fingerprint can NOT match. The oracle re-derives every
    grayscale value in hex-string space and brute-forces ALL pairwise
    Hamming distances, so a hash match simultaneously proves the
    dhash bits, the codec round trip, AND that the pigeonhole banding
    lost no pair (banded candidates == ground truth)."""
    from ..operators import dedup as D
    base = (tbl(spark, sf, "documents")
            .where(F.col("doc_id") < 500).select("doc_id"))
    imgs = M.attach_bmp_media(base, "doc_id", width=9, height=8)
    clones = (M.perturb_pixels(imgs.where(F.col("doc_id") % 5 == 0),
                               delta=17)
              .withColumn("doc_id", F.col("doc_id") + 100000))
    corpus = imgs.unionByName(clones)
    fp = M.image_dhash(corpus, id_col="doc_id")
    pairs = D.hamming_fp_pairs(fp, bits=64, bands=4, max_hamming=3,
                               id_col="doc_id", fp_col="dhash")
    return (pairs.select(F.col("id_a"), F.col("id_b"),
                         F.col("hamming").cast("int").alias("hamming"))
            .orderBy("id_a", "id_b"))


# dhash twin in hex-string space: 9x8 BMP pixels are the first 216
# bytes of sha256(str(doc_id)) repeated; gray = exact channel-sum / 3;
# bit (y, x) = g[y*9+x] > g[y*9+x+1]. The clone nudges channel 0 of
# flat pixel 0 by +17 (saturating). Ground truth = ALL-pairs Hamming.
_MM_DHASH_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 500),
s AS (SELECT doc_id, repeat(sha256(CAST(doc_id AS VARCHAR)), 7) AS h
      FROM d),
b AS (SELECT doc_id, list_transform(range(0, 216), j ->
        CAST(concat('0x', substr(h, j*2+1, 2)) AS INT)) AS bs FROM s),
orig AS (SELECT doc_id, list_transform(range(0, 72), p ->
        (bs[p*3+1] + bs[p*3+2] + bs[p*3+3]) / 3.0) AS g FROM b),
clone AS (SELECT doc_id + 100000 AS doc_id,
        list_transform(range(0, 72), p -> CASE WHEN p = 0
          THEN (least(bs[1] + 17, 255) + bs[2] + bs[3]) / 3.0
          ELSE (bs[p*3+1] + bs[p*3+2] + bs[p*3+3]) / 3.0 END) AS g
        FROM b WHERE doc_id % 5 = 0),
gall AS (SELECT * FROM orig UNION ALL SELECT * FROM clone),
bits AS (SELECT doc_id, list_transform(range(0, 64), i ->
           g[(i // 8) * 9 + (i % 8) + 1] > g[(i // 8) * 9 + (i % 8) + 2])
           AS bt FROM gall),
pairs AS (
  SELECT a.doc_id AS id_a, c.doc_id AS id_b,
         CAST(len(list_filter(range(0, 64), i -> a.bt[i+1] <> c.bt[i+1]))
              AS INT) AS hamming
  FROM bits a JOIN bits c ON a.doc_id < c.doc_id)
SELECT id_a, id_b, hamming FROM pairs
WHERE hamming <= 3 ORDER BY id_a, id_b
"""

QUERIES["mm_phash_neardup"] = QueryDef(mm_phash_neardup, _MM_DHASH_SQL)


def mm_audio_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual audio near-dup (operators/multimodal.audio_fingerprint
    energy mode + dedup.hamming_fp_pairs): one 256-sample WAV per doc
    plus a one-sample perturbed twin (full WAV decode->modify->encode)
    for every 5th doc. Segment energies are EXACT int64 sums of
    int16^2, so the oracle re-derives every fingerprint bit from the
    sha256 hex stream and brute-forces ALL pairwise Hamming distances
    -- a hash match proves the codec round trip, the bit rule, AND
    zero banding recall loss at max_hamming=3."""
    from ..operators import dedup as D
    base = (tbl(spark, sf, "documents")
            .where(F.col("doc_id") < 500).select("doc_id"))
    wavs = M.attach_wav_media(base, "doc_id")
    twins = (M.perturb_samples(wavs.where(F.col("doc_id") % 5 == 0),
                               delta=17)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    corpus = wavs.unionByName(twins)
    fp = M.audio_fingerprint(corpus, id_col="doc_id")
    pairs = D.hamming_fp_pairs(fp, bits=64, bands=4, max_hamming=3,
                               id_col="doc_id", fp_col="afp")
    return (pairs.select(F.col("id_a"), F.col("id_b"),
                         F.col("hamming").cast("int").alias("hamming"))
            .orderBy("id_a", "id_b"))


# energy-fingerprint twin in hex-string space: 256 int16 LE samples =
# the first 512 bytes of sha256(str(doc_id)) repeated; 65 segments of
# floor(256/65)=3 samples; E(m) = exact int64 sum of squares; bit m =
# E(m) > E(m+1). The twin saturating-adds 17 to sample 0 (only E(0),
# hence only bit 0, can differ). Ground truth = ALL-pairs Hamming.
_MM_AUDIO_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 500),
s AS (SELECT doc_id, repeat(sha256(CAST(doc_id AS VARCHAR)), 17) AS h
      FROM d),
b AS (SELECT doc_id, list_transform(range(0, 512), j ->
        CAST(concat('0x', substr(h, j*2+1, 2)) AS INT)) AS bs FROM s),
sm AS (SELECT doc_id, list_transform(range(0, 256), i ->
        bs[2*i+1] + 256*bs[2*i+2]
        - CASE WHEN bs[2*i+1] + 256*bs[2*i+2] >= 32768
               THEN 65536 ELSE 0 END) AS x FROM b),
tw AS (SELECT doc_id + 100000 AS doc_id,
        list_transform(range(0, 256), i -> CASE WHEN i = 0
          THEN least(x[1] + 17, 32767)
          ELSE x[i+1] END) AS x
       FROM sm WHERE doc_id % 5 = 0),
sall AS (SELECT * FROM sm UNION ALL SELECT * FROM tw),
en AS (SELECT doc_id, list_transform(range(0, 65), m ->
        CAST(x[3*m+1] AS BIGINT)*x[3*m+1]
        + CAST(x[3*m+2] AS BIGINT)*x[3*m+2]
        + CAST(x[3*m+3] AS BIGINT)*x[3*m+3]) AS e FROM sall),
bits AS (SELECT doc_id, list_transform(range(0, 64), m ->
           e[m+1] > e[m+2]) AS bt FROM en),
pairs AS (
  SELECT a.doc_id AS id_a, c.doc_id AS id_b,
         CAST(len(list_filter(range(0, 64), i -> a.bt[i+1] <> c.bt[i+1]))
              AS INT) AS hamming
  FROM bits a JOIN bits c ON a.doc_id < c.doc_id)
SELECT id_a, id_b, hamming FROM pairs
WHERE hamming <= 3 ORDER BY id_a, id_b
"""

QUERIES["mm_audio_neardup"] = QueryDef(mm_audio_neardup, _MM_AUDIO_SQL)
