"""Structured Streaming queries with batch-equivalent oracles.

The reference's streaming layer is batch pipelining only (SURVEY §2.10);
this engine ships real Structured Streaming, and because a watermarked
tumbling aggregation over a static source with Trigger.AvailableNow
produces EXACTLY the batch grouping, the DuckDB oracle can value-check
the streaming execution path end-to-end: the query below actually runs
a streaming job into a memory sink and returns its result table.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, tbl
from ..rowframe import local_df


def stream_tumbling_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked 6-hour tumbling counts/sums per event_type, executed
    by the streaming engine (AvailableNow micro-batches -> memory sink).
    value is decimal-cast BEFORE aggregation so the streamed sum is
    exact and engine-comparable."""
    from ..streaming import read_stream_parquet, run_available_now, \
        tumbling_agg

    batch = tbl(spark, sf, "events").withColumn(
        "value", F.col("value").cast("decimal(12,2)"))
    # stage the normalized frame so the file stream source sees a plain
    # parquet directory with the exact schema we aggregated
    stage = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    batch.coalesce(4).write.mode("overwrite").parquet(stage)
    stream = read_stream_parquet(spark, stage, batch.schema,
                                 max_files_per_trigger=2)
    res = run_available_now(
        tumbling_agg(stream, "ts", "6 hours", ["event_type"]),
        f"t_stream_{uuid.uuid4().hex[:8]}")
    # memory sink holds the result; the staging dir is dead weight now
    shutil.rmtree(stage, ignore_errors=True)
    return (res.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"))
        .orderBy("win_start", "event_type"))


_STREAM_TUMBLING_SQL = """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600
                               AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def stream_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Native stateful session_window sessionization on the streaming
    engine, value-checked against the batch gaps-and-islands oracle
    (same 30-minute gap rule)."""
    from ..streaming import read_stream_parquet, run_available_now, \
        sessionize_stateful

    batch = tbl(spark, sf, "events")
    stage = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    batch.coalesce(4).write.mode("overwrite").parquet(stage)
    stream = read_stream_parquet(spark, stage, batch.schema,
                                 max_files_per_trigger=2)
    res = run_available_now(
        sessionize_stateful(stream, "ts", "user_id", gap="30 minutes"),
        f"t_sess_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(stage, ignore_errors=True)
    return (res.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.max("n_events").cast("bigint").alias("max_session_events"))
            .orderBy("user_id"))


_STREAM_SESSION_SQL = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps),
per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, sess_id)
SELECT user_id, COUNT(*) AS n_sessions,
       MAX(n_events) AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


def stream_sliding_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping sliding windows (6-hour window, 3-hour slide: every
    event belongs to exactly two windows) on the streaming engine; the
    batch oracle re-derives both window starts per event arithmetically."""
    from ..streaming import read_stream_parquet, run_available_now, \
        sliding_agg

    batch = tbl(spark, sf, "events").withColumn(
        "value", F.col("value").cast("decimal(12,2)"))
    stage = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    batch.coalesce(4).write.mode("overwrite").parquet(stage)
    stream = read_stream_parquet(spark, stage, batch.schema,
                                 max_files_per_trigger=2)
    res = run_available_now(
        sliding_agg(stream, "ts", "6 hours", "3 hours", ["event_type"]),
        f"t_slide_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(stage, ignore_errors=True)
    return (res.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"))
        .orderBy("win_start", "event_type"))


_STREAM_SLIDING_SQL = """
WITH assigned AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts) / 10800) * 10800
              - off.o * 10800 AS BIGINT) AS win_start_epoch
  FROM events
  CROSS JOIN (VALUES (0), (1)) AS off(o))
SELECT strftime(make_timestamp(win_start_epoch * 1000000),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY 1, 2 ORDER BY 1, 2
"""


def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked STREAM-STREAM interval join, the stateful join both
    sides buffer state for (streaming/joins.py): purchases join onto
    clicks by user within [click_ts, click_ts + 6h]. Both event streams
    run through the real streaming engine (AvailableNow -> memory
    sink); the joined rows are then batch-aggregated for a stable
    output. Oracle: the identical interval join stated in plain SQL."""
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_stream_interval_join)

    e = tbl(spark, sf, "events")
    clicks = (e.where(F.col("event_type") == "click")
              .select("user_id", "ts"))
    buys = (e.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("user_id_r"),
                    F.col("ts").alias("ts_r"),
                    F.col("value").cast("decimal(12,2)").alias("bval")))
    stage_c = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    stage_b = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    # repartition (not coalesce -- the filtered frames may already be 1
    # partition, and coalesce can't grow) so each side genuinely has 2
    # files and max_files_per_trigger=1 drives MULTIPLE micro-batches:
    # the stateful path where batch-2 rows join batch-1 state. The
    # watermark must then exceed the events table's full time span
    # (~30 days) -- files split by hash, not time, so a row's match can
    # arrive a whole span "late"; a narrower watermark would evict its
    # state and silently drop pairs vs the batch oracle.
    clicks.repartition(2).write.mode("overwrite").parquet(stage_c)
    buys.repartition(2).write.mode("overwrite").parquet(stage_b)
    sc = read_stream_parquet(spark, stage_c, clicks.schema,
                             max_files_per_trigger=1)
    sb = read_stream_parquet(spark, stage_b, buys.schema,
                             max_files_per_trigger=1)
    joined = stream_stream_interval_join(
        sc, sb, key="user_id", left_ts="ts", right_ts="ts_r",
        upper="INTERVAL 6 HOURS", watermark="60 days")
    res = run_available_now(joined, f"t_ssj_{uuid.uuid4().hex[:8]}",
                            output_mode="append")
    shutil.rmtree(stage_c, ignore_errors=True)
    shutil.rmtree(stage_b, ignore_errors=True)
    return (res.groupBy((F.col("user_id") % 10).alias("user_bucket"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("bval").cast("double").alias("sum_buy_value"))
            .orderBy("user_bucket"))


_STREAM_SSJOIN_SQL = """
SELECT c.user_id % 10 AS user_bucket, COUNT(*) AS n_pairs,
       CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_buy_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


def stream_stateful_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary per-key state machine under the gate: per-user
    running (n, total) maintained in explicit GroupState
    (applyInPandasWithState, streaming/stateful.py) across MULTIPLE
    micro-batches (2 staged files, max_files_per_trigger=1), so state
    genuinely carries batch to batch. The final emit per key equals
    the batch groupBy, which the oracle states in plain SQL. value is
    carried as integer cents (exact in float64) so the streamed float
    accumulation is order-independent."""
    from ..streaming import (read_stream_parquet, run_available_now,
                             running_totals_stateful)

    e = (tbl(spark, sf, "events")
         .select("user_id",
                 (F.col("value").cast("decimal(12,2)") * 100)
                 .cast("bigint").cast("double").alias("value")))
    stage = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    e.repartition(2).write.mode("overwrite").parquet(stage)
    stream = read_stream_parquet(spark, stage, e.schema,
                                 max_files_per_trigger=1)
    res = run_available_now(
        running_totals_stateful(stream, "user_id", "value"),
        f"t_sst_{uuid.uuid4().hex[:8]}", output_mode="update")
    shutil.rmtree(stage, ignore_errors=True)
    # update mode emits one row per key per batch it appears in; n is
    # strictly increasing per key, so max_by(total, n) is the final state
    final = (res.groupBy("user_id")
             .agg(F.max("n").alias("n_events"),
                  F.max_by("total", "n").alias("cents")))
    return (final.groupBy((F.col("user_id") % 10).alias("user_bucket"))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("n_events").cast("bigint").alias("n_events"),
                 (F.sum("cents") / F.lit(100.0)).alias("sum_value"))
            .orderBy("user_bucket"))


_STREAM_STATEFUL_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(12,2))) AS total
  FROM events GROUP BY user_id)
SELECT user_id % 10 AS user_bucket,
       COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(total) AS DOUBLE) AS sum_value
FROM per_user
GROUP BY 1 ORDER BY 1
"""


def stream_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming incremental dedup under the gate: the corpus is indexed
    once (batch minhash_signatures, persisted), the new batch (doc_id<5
    re-keyed +100000, same construction as dedup_incremental_minhash)
    arrives as a 2-file stream with max_files_per_trigger=1 -- so the
    band join, verify join, and pair dedup genuinely run across
    multiple micro-batches. The per-row signature projection
    (minhash_signature_cols) is value-identical to the aggregate
    builder, so this shares dedup_incremental_minhash's oracle
    verbatim: the streaming engine must emit the exact same verified
    pairs as the batch path AND the SQL restatement."""
    from pyspark.storagelevel import StorageLevel

    from ..operators import dedup as D
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_minhash_flags)

    d = tbl(spark, sf, "documents")
    corpus_sig = (D.minhash_signatures(d)
                  .persist(StorageLevel.MEMORY_AND_DISK))
    D._PERSISTED.append(corpus_sig)
    new = (d.where(F.col("doc_id") < 5)
           .withColumn("doc_id", F.col("doc_id") + F.lit(100000))
           .select("doc_id", "text"))
    stage = f"/tmp/bodo_spark_stream_{uuid.uuid4().hex[:8]}"
    try:
        new.repartition(2).write.mode("overwrite").parquet(stage)
        stream = read_stream_parquet(spark, stage, new.schema,
                                     max_files_per_trigger=1)
        res = run_available_now(
            stream_minhash_flags(stream, corpus_sig, threshold=0.5),
            f"t_sdedup_{uuid.uuid4().hex[:8]}", output_mode="append")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return res.orderBy("new_id", "corpus_id")


def _incr_oracle() -> str:
    from .dedup import _DEDUP_INCR_SQL
    return _DEDUP_INCR_SQL


def stream_bloom_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact-dedup ingest under the gate: corpus indexed once
    into a Bloom word table (persisted parquet), batch = the SAME
    held-out-tenth + replayed-sevenths construction as the batch
    dedup_bloom_ingest gate, streamed as a 2-file source with
    max_files_per_trigger=1. The stateless probe (k broadcast
    stream-static bit joins + NULL-keyed corpus confirm) must admit the
    exact same new rows across micro-batches as the batch operator --
    the two gates share the anti-join oracle verbatim."""
    from ..operators import bloom as B
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_bloom_new_rows)

    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    replay = (corpus.where(F.col("doc_id") % 7 == 1)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    batch = (d.where(F.col("doc_id") % 10 == 0).unionByName(replay)
             .withColumn("_key", F.md5("text")))
    m_bits, k = 1 << 17, 5
    stage = f"/tmp/bodo_spark_sbloom_{uuid.uuid4().hex[:8]}"
    try:
        B.write_bloom_index(corpus, f"{stage}/idx", F.md5("text"),
                            m_bits=m_bits, k=k)
        corpus.select(F.md5("text").alias("_key")).write \
            .mode("overwrite").parquet(f"{stage}/keys")
        batch.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/batch")
        words = B.read_bloom_index(spark, f"{stage}/idx")
        keys = spark.read.parquet(f"{stage}/keys")
        stream = read_stream_parquet(spark, f"{stage}/batch",
                                     batch.schema,
                                     max_files_per_trigger=1)
        new = stream_bloom_new_rows(stream, words, keys,
                                    key_col="_key", m_bits=m_bits, k=k)
        res = run_available_now(new, f"t_sbloom_{uuid.uuid4().hex[:8]}",
                                output_mode="append")
        return (res.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_new"),
            F.bit_xor("doc_id").alias("id_xor"))
            .orderBy("lang"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _bloom_oracle() -> str:
    from .dedup import _DEDUP_BLOOM_SQL
    return _DEDUP_BLOOM_SQL


def stream_sketch_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed heavy hitters ON the stream: per 6-hour tumbling window,
    the approx_top_k sketch aggregates event types across micro-batches
    (the sketch state lives in the streaming state store and merges as
    batches arrive). Run in the exact regime (maxItemsTracked >> NDV),
    so the emitted (window, item, count) table hash-matches the plain
    batch groupBy -- proving the sketch's merge path under the
    streaming engine, not just in batch shuffles."""
    from ..streaming import read_stream_parquet, run_available_now

    batch = tbl(spark, sf, "events").select("ts", "event_type")
    stage = f"/tmp/bodo_spark_ssk_{uuid.uuid4().hex[:8]}"
    try:
        batch.coalesce(4).write.mode("overwrite").parquet(stage)
        stream = read_stream_parquet(spark, stage, batch.schema,
                                     max_files_per_trigger=2)
        agg = (stream.groupBy(F.window("ts", "6 hours").alias("w"))
               .agg(F.expr("approx_top_k(event_type, 64, 64)").alias("tk")))
        res = run_available_now(agg, f"t_ssk_{uuid.uuid4().hex[:8]}",
                                output_mode="complete")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return (res.select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                       .alias("win_start"), F.explode("tk").alias("e"))
            .select("win_start", F.col("e.item").alias("event_type"),
                    F.col("e.count").cast("bigint").alias("n"))
            .orderBy("win_start", "event_type"))


_STREAM_SKETCH_SQL = """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600
                               AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, COUNT(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES: dict[str, QueryDef] = {
    "stream_sketch_topk": QueryDef(stream_sketch_topk, _STREAM_SKETCH_SQL),
    "stream_bloom_ingest": QueryDef(stream_bloom_ingest, _bloom_oracle()),
    "stream_incremental_dedup": QueryDef(stream_incremental_dedup,
                                         _incr_oracle()),
    "stream_stateful_totals": QueryDef(stream_stateful_totals,
                                       _STREAM_STATEFUL_SQL),
    "stream_stream_join": QueryDef(stream_stream_join, _STREAM_SSJOIN_SQL),
    "stream_sliding_agg": QueryDef(stream_sliding_agg, _STREAM_SLIDING_SQL),
    "stream_tumbling_agg": QueryDef(stream_tumbling_agg,
                                    _STREAM_TUMBLING_SQL),
    "stream_session_windows": QueryDef(stream_session_windows,
                                       _STREAM_SESSION_SQL),
}


# --------------------------------------------------------------------------
# streaming span excision + line dedup against stored indexes (the r9
# index-once-clean-every-batch pattern extended from row-level Bloom
# dedup to SUBSTRING- and LINE-level cleaning)

def stream_span_excise(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ExactSubstr (streaming/dedup.stream_excise_spans):
    the corpus' distinct 20-token gram hashes are indexed once to
    parquet; held-out docs stream through as a 2-file source and every
    gram hitting the index is excised. The oracle recomputes the
    excision in DuckDB (gram hashes in md5 hex space), pinning each
    cleaned page's md5 -- exact surviving tokens AND order, through
    the posexplode -> stream-static join -> stateful-rebuild plan."""
    from ..operators import dedup as D
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_excise_spans)

    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    stage = f"/tmp/bodo_spark_sspan_{uuid.uuid4().hex[:8]}"
    try:
        D.gram_hash_index(corpus, span=20).write \
            .mode("overwrite").parquet(f"{stage}/idx")
        batch.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/batch")
        idx = spark.read.parquet(f"{stage}/idx")
        stream = read_stream_parquet(spark, f"{stage}/batch",
                                     batch.schema,
                                     max_files_per_trigger=1)
        cleaned = stream_excise_spans(stream, idx, span=20)
        res = run_available_now(cleaned,
                                f"t_sspan_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        return (res.join(batch.select("doc_id", "lang"), "doc_id")
                .groupBy("lang").agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.length("clean")).cast("bigint")
                    .alias("sum_chars"),
                    F.md5(F.array_join(
                        F.array_sort(F.collect_list(F.md5("clean"))), ""))
                    .alias("text_hash"))
                .orderBy("lang"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_span_sql() -> str:
    from .dedup import _sql_h60
    span = 20
    return f"""
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents),
cidx AS (
  SELECT DISTINCT {_sql_h60(f"array_to_string(ts[i:i+{span - 1}], ' ')")}
         AS gh
  FROM docs, UNNEST(range(1, len(ts) - {span} + 2)) AS t(i)
  WHERE doc_id % 10 <> 0),
sgrams AS (
  SELECT doc_id, i - 1 AS pos,
         {_sql_h60(f"array_to_string(ts[i:i+{span - 1}], ' ')")} AS gh
  FROM docs, UNNEST(range(1, len(ts) - {span} + 2)) AS t(i)
  WHERE doc_id % 10 = 0),
hits AS (SELECT doc_id, pos FROM sgrams WHERE gh IN (SELECT gh FROM cidx)),
covered AS (
  SELECT DISTINCT doc_id, pos + d AS idx
  FROM hits, UNNEST(range(0, {span})) AS t(d)),
toks AS (
  SELECT doc_id, ts[CAST(i AS INTEGER)] AS tok, CAST(i AS INTEGER) - 1 AS idx
  FROM docs, UNNEST(range(1, len(ts) + 1)) AS t(i)
  WHERE doc_id % 10 = 0),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.idx) AS clean
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL GROUP BY t.doc_id),
cleaned AS (
  SELECT d.doc_id, d.lang, COALESCE(k.clean, '') AS clean
  FROM docs d LEFT JOIN kept k USING (doc_id) WHERE d.doc_id % 10 = 0)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(clean)) AS BIGINT) AS sum_chars,
       md5(string_agg(md5(clean), '' ORDER BY md5(clean))) AS text_hash
FROM cleaned GROUP BY lang ORDER BY lang
"""


def stream_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming RefinedWeb line dedup (streaming/dedup.
    stream_drop_boilerplate_lines): the corpus' boilerplate-line-hash
    set (doc-freq > 1, short-line exemption) is indexed once; held-out
    pages stream through and indexed lines are dropped. Page
    construction mirrors cur_line_dedup (nav headers / global footer /
    blank separators); the oracle pins every cleaned page's md5."""
    from ..operators.curation import boilerplate_line_index
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_drop_boilerplate_lines)
    from .curation import _FOOTER

    d = tbl(spark, sf, "documents")
    header = F.when(F.col("doc_id") % 3 > 0,
                    F.concat(F.lit("NAV "), F.col("source"),
                             F.lit(" HOME")))
    footer = F.when(F.col("doc_id") % 2 > 0, F.lit(_FOOTER))
    paged = d.select(
        "doc_id", "lang",
        F.concat_ws("\n", header, F.lit(""), F.col("text"), footer)
        .alias("text"))
    corpus = paged.where(F.col("doc_id") % 10 != 0)
    batch = paged.where(F.col("doc_id") % 10 == 0)
    # the stored index: normalized-line hashes with corpus doc-freq > 1
    # (blank/short lines exempt; mode-switched hash family, so the
    # index matches the probe in BOTH exact and fast mode)
    bad = boilerplate_line_index(corpus)
    stage = f"/tmp/bodo_spark_sline_{uuid.uuid4().hex[:8]}"
    try:
        bad.write.mode("overwrite").parquet(f"{stage}/idx")
        batch.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/batch")
        idx = spark.read.parquet(f"{stage}/idx")
        stream = read_stream_parquet(spark, f"{stage}/batch",
                                     batch.schema,
                                     max_files_per_trigger=1)
        cleaned = stream_drop_boilerplate_lines(stream, idx)
        res = run_available_now(cleaned,
                                f"t_sline_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        return (res.join(batch.select("doc_id", "lang"), "doc_id")
                .groupBy("lang").agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.length("clean")).cast("bigint")
                    .alias("sum_chars"),
                    F.md5(F.array_join(
                        F.array_sort(F.collect_list(F.md5("clean"))), ""))
                    .alias("text_hash"))
                .orderBy("lang"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_line_sql() -> str:
    from .curation import _FOOTER
    return f"""
WITH paged AS (
  SELECT doc_id, lang,
         concat_ws(chr(10),
           CASE WHEN doc_id % 3 > 0 THEN 'NAV ' || source || ' HOME' END,
           '', text,
           CASE WHEN doc_id % 2 > 0 THEN '{_FOOTER}' END) AS page
  FROM documents),
ex AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM (SELECT doc_id, str_split(page, chr(10)) AS ls FROM paged) t,
       unnest(range(1, len(ls) + 1)) AS r(i)),
bad AS (
  SELECT lower(trim(line)) AS nl
  FROM ex WHERE len(lower(trim(line))) >= 1 AND doc_id % 10 <> 0
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1),
kept AS (
  SELECT e.doc_id, e.pos, e.line FROM ex e
  WHERE e.doc_id % 10 = 0
    AND lower(trim(e.line)) NOT IN (SELECT nl FROM bad)),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean
  FROM kept GROUP BY doc_id),
final AS (
  SELECT p.doc_id, p.lang, COALESCE(r.clean, '') AS clean
  FROM paged p LEFT JOIN rebuilt r USING (doc_id)
  WHERE p.doc_id % 10 = 0)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(clean)) AS BIGINT) AS sum_chars,
       md5(string_agg(md5(clean), '' ORDER BY md5(clean))) AS text_hash
FROM final GROUP BY lang ORDER BY lang
"""


QUERIES["stream_span_excise"] = QueryDef(stream_span_excise,
                                         _stream_span_sql())
QUERIES["stream_line_dedup"] = QueryDef(stream_line_dedup,
                                        _stream_line_sql())


def stream_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming incremental SemDeDup (streaming/dedup.py
    stream_semantic_new_rows): the corpus' cell index is staged to
    parquet once; the batch (held-out tenth + planted exact replays)
    streams through as a 2-file source and only rows with no same-cell
    index member at cosine >= 0.5 survive. Shares the batch gate's
    construction and oracle verbatim (queries/similarity.py
    emb_semdedup_ingest) -- streaming must admit the identical rows."""
    from ..operators import similarity as S
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_semantic_new_rows)
    from .similarity import _semdedup_corpus_batch

    corpus, batch, cents = _semdedup_corpus_batch(spark, sf)
    stage = f"/tmp/bodo_spark_ssem_{uuid.uuid4().hex[:8]}"
    try:
        S.semantic_cell_index(corpus, cents).write \
            .mode("overwrite").parquet(f"{stage}/idx")
        batch.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/batch")
        idx = spark.read.parquet(f"{stage}/idx")
        stream = read_stream_parquet(spark, f"{stage}/batch",
                                     batch.schema,
                                     max_files_per_trigger=1)
        kept = stream_semantic_new_rows(stream, idx, cents, eps=0.5)
        res = run_available_now(kept, f"t_ssem_{uuid.uuid4().hex[:8]}",
                                output_mode="append")
        return (res.groupBy("label").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.bit_xor("vec_id").alias("id_xor"))
            .orderBy("label"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_semdedup_sql() -> str:
    from .similarity import _SEMDEDUP_BETWEEN_SQL
    return _SEMDEDUP_BETWEEN_SQL


QUERIES["stream_semantic_dedup"] = QueryDef(stream_semantic_dedup,
                                            _stream_semdedup_sql())


def stream_dataset_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed data card ON the stream (the streaming twin of
    operators/sketches.dataset_profile, over events): per 6-hour
    tumbling window, ordinary counts plus mergeable sketch states --
    theta NDV of users and event types, one KLL state read for both
    value percentiles -- all merging across micro-batches in the
    streaming state store. Exact regime (window rows << sketch
    budgets), so every value hash-matches the batch oracle: the
    percentile is the data element at ceil-rank, bit-identical."""
    from ..streaming import read_stream_parquet, run_available_now

    batch = tbl(spark, sf, "events").select("ts", "user_id",
                                            "event_type", "value")
    stage = f"/tmp/bodo_spark_sprof_{uuid.uuid4().hex[:8]}"
    try:
        batch.coalesce(4).write.mode("overwrite").parquet(stage)
        stream = read_stream_parquet(spark, stage, batch.schema,
                                     max_files_per_trigger=2)
        q = "kll_sketch_get_quantile_double(_sk, CAST({p} AS double))"
        agg = (stream.groupBy(F.window("ts", "6 hours").alias("w"))
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.expr("theta_sketch_estimate(theta_sketch_agg("
                           "CAST(user_id AS STRING), 14))")
                    .cast("bigint").alias("n_users"),
                    F.expr("theta_sketch_estimate(theta_sketch_agg("
                           "event_type, 14))")
                    .cast("bigint").alias("n_types"),
                    F.expr("kll_sketch_agg_double(CAST(value AS double),"
                           " 8192)").alias("_sk")))
        res = run_available_now(agg, f"t_sprof_{uuid.uuid4().hex[:8]}",
                                output_mode="complete")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return (res.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
        .alias("win_start"), "n_events", "n_users", "n_types",
        F.expr(q.format(p=0.5)).alias("val_p50"),
        F.expr(q.format(p=0.9)).alias("val_p90"))
        .orderBy("win_start"))


_STREAM_PROFILE_SQL = """
WITH w AS (
  SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600
                                 AS BIGINT) * 1000000),
                  '%Y-%m-%d %H:%M:%S') AS win_start,
         user_id, event_type, value
  FROM events),
g AS (
  SELECT win_start, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         COUNT(DISTINCT event_type) AS n_types
  FROM w GROUP BY win_start),
r AS (
  SELECT win_start, value,
         row_number() OVER (PARTITION BY win_start ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY win_start) AS cnt
  FROM w),
q AS (
  SELECT win_start,
         MAX(CASE WHEN rn = greatest(CAST(ceil(0.5 * cnt) AS BIGINT), 1)
                  THEN value END) AS val_p50,
         MAX(CASE WHEN rn = greatest(CAST(ceil(0.9 * cnt) AS BIGINT), 1)
                  THEN value END) AS val_p90
  FROM r GROUP BY win_start)
SELECT g.win_start, g.n_events, g.n_users, g.n_types,
       q.val_p50, q.val_p90
FROM g JOIN q ON g.win_start = q.win_start
ORDER BY g.win_start
"""

QUERIES["stream_dataset_profile"] = QueryDef(stream_dataset_profile,
                                             _STREAM_PROFILE_SQL)


def stream_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming decontamination (streaming/dedup.py
    stream_decontaminate_new_rows): the benchmark slice's distinct
    5-grams are indexed to parquet once; the training corpus streams
    through as a 2-file source and docs sharing any gram are dropped.
    Shares cur_decontaminate's oracle verbatim (queries/curation.py)
    -- the stream must keep the identical docs."""
    from ..operators.dedup import word_shingles
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_decontaminate_new_rows)

    d = tbl(spark, sf, "documents").select("doc_id", "source", "text")
    bench = d.where(F.col("doc_id") % 19 == 0)
    train = d.where(F.col("doc_id") % 19 != 0)
    stage = f"/tmp/bodo_spark_sdec_{uuid.uuid4().hex[:8]}"
    try:
        (bench.select(F.explode(
            word_shingles("text", 5, distinct=False)).alias("gram"))
         .distinct().write.mode("overwrite").parquet(f"{stage}/idx"))
        train.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/batch")
        idx = spark.read.parquet(f"{stage}/idx")
        stream = read_stream_parquet(spark, f"{stage}/batch",
                                     train.schema,
                                     max_files_per_trigger=1)
        clean = stream_decontaminate_new_rows(
            stream.select("doc_id", "text"), idx, k=5)
        res = run_available_now(clean, f"t_sdec_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        tot = train.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_train"))
        kept = (res.join(train.select("doc_id", "source"), "doc_id")
                .groupBy("source").agg(F.count(F.lit(1))
                                       .alias("n_clean")))
        return (tot.join(kept, "source", "left")
                .select("source", "n_train",
                        F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
                        (F.col("n_train")
                         - F.coalesce("n_clean", F.lit(0)))
                        .alias("n_dropped"))
                .orderBy("source"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_decon_sql() -> str:
    from .curation import _DECON_SQL
    return _DECON_SQL


QUERIES["stream_decontaminate"] = QueryDef(stream_decontaminate,
                                           _stream_decon_sql())


def stream_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming IVF-PQ search (streaming/ann.py stream_ivf_pq_topk):
    the inverted file and centroid table are staged to parquet once
    (the stored serving artifacts); the 3 query vectors then replay as
    a 2-file stream and each micro-batch probes 2 cells and ADC-scores
    only those cells' code rows. Shares ann_ivf_pq_topk's oracle
    verbatim (queries/similarity.py) -- the served stream must return
    the identical ranking the batch search computes."""
    from ..operators import pq as PQ
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_ivf_pq_topk)

    emb = tbl(spark, sf, "embeddings")
    cbs = PQ.lowest_id_pq_codebooks(emb, m=4, k=16)
    cents = [(r["vec_id"], list(r["embedding"])[:16])
             for r in emb.select("vec_id", "embedding")
             .orderBy("vec_id").limit(8).collect()]
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    stage = f"/tmp/bodo_spark_sann_{uuid.uuid4().hex[:8]}"
    try:
        PQ.ivf_pq_index(emb, cbs, n_cells=8).write \
            .mode("overwrite").parquet(f"{stage}/idx")
        queries.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/q")
        idx = spark.read.parquet(f"{stage}/idx")
        stream = read_stream_parquet(spark, f"{stage}/q", queries.schema,
                                     max_files_per_trigger=1)
        topk = stream_ivf_pq_topk(stream, idx, cbs, cents,
                                  k=5, n_probe=2)
        res = run_available_now(topk, f"t_sann_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        return (res.where(F.col("vec_id") != F.col("q_id"))
                .orderBy("q_id", "rn"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_ann_sql() -> str:
    from .similarity import _IVF_PQ_SQL
    return _IVF_PQ_SQL


QUERIES["stream_ann_topk"] = QueryDef(stream_ann_topk, _stream_ann_sql())


def stream_ann_stored_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming serving over the cell-partitioned STORED IVF-SQ index
    (streaming/ann.serve_sq_stored_stream): the index is built and
    stored once (sq_store_index), then the 3 query vectors replay as a
    2-file stream and each micro-batch reads only its probed cells'
    directories (sq_stored_topk inside foreachBatch -- the probed-cell
    PartitionFilters list is a per-batch driver value). Shares
    ann_ivf_sq_topk's oracle verbatim: the served stream must return
    the identical ranking the batch search computes."""
    from ..operators import sq as Q
    from ..streaming import read_stream_parquet
    from ..streaming.ann import serve_sq_stored_stream

    emb = tbl(spark, sf, "embeddings")
    los, his = Q.sq_train(emb)
    idx = Q.ivf_sq_index(emb, los, his, n_cells=8)
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    stage = f"/tmp/bodo_spark_sannst_{uuid.uuid4().hex[:8]}"
    try:
        Q.sq_store_index(idx, f"{stage}/idx", los, his, n_cells=8,
                         seed_vectors=emb)
        queries.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/q")
        stream = read_stream_parquet(spark, f"{stage}/q",
                                     queries.schema,
                                     max_files_per_trigger=1)
        serve_sq_stored_stream(
            stream, f"{stage}/idx", f"{stage}/out", k=5, n_probe=2,
            query_name=f"sqst_{uuid.uuid4().hex[:8]}")
        out = (spark.read.parquet(f"{stage}/out")
               .where(F.col("vec_id") != F.col("q_id"))
               .orderBy("q_id", "rn"))
        rows = [tuple(r) for r in out.collect()]
        return local_df(
            spark,
            rows, "q_id long, vec_id long, adist double, rn long")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_ann_stored_sql() -> str:
    from .similarity import _IVF_SQ_SQL
    return _IVF_SQ_SQL


QUERIES["stream_ann_stored_topk"] = QueryDef(
    stream_ann_stored_topk, _stream_ann_stored_sql(),
    doc="query stream served from the cell-partitioned stored index; "
        "per-batch I/O bound by the probed shards")


def stream_ann_pq_stored_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming serving over the cell-partitioned STORED IVF-PQ index
    (streaming/ann.serve_pq_stored_stream -- the SQ stored serve's twin
    for the codebook family): the inverted file + codebooks + centroid
    probe table are stored once (pq_store_index), then the 3 query
    vectors replay as a 2-file stream and each micro-batch ADC-scores
    only its probed cells' directories (pq_stored_topk inside
    foreachBatch). Shares ann_ivf_pq_topk's oracle verbatim: the
    served stream must return the identical ranking the batch search
    computes."""
    from ..operators import pq as PQ
    from ..streaming import read_stream_parquet
    from ..streaming.ann import serve_pq_stored_stream

    emb = tbl(spark, sf, "embeddings")
    cbs = PQ.lowest_id_pq_codebooks(emb, m=4, k=16)
    idx = PQ.ivf_pq_index(emb, cbs, n_cells=8)
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    stage = f"/tmp/bodo_spark_pannst_{uuid.uuid4().hex[:8]}"
    try:
        PQ.pq_store_index(idx, f"{stage}/idx", cbs, n_cells=8,
                          seed_vectors=emb)
        queries.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/q")
        stream = read_stream_parquet(spark, f"{stage}/q",
                                     queries.schema,
                                     max_files_per_trigger=1)
        serve_pq_stored_stream(
            stream, f"{stage}/idx", f"{stage}/out", k=5, n_probe=2,
            query_name=f"pqst_{uuid.uuid4().hex[:8]}")
        out = (spark.read.parquet(f"{stage}/out")
               .where(F.col("vec_id") != F.col("q_id"))
               .orderBy("q_id", "rn"))
        rows = [tuple(r) for r in out.collect()]
        return local_df(
            spark,
            rows, "q_id long, vec_id long, adist double, rn long")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


QUERIES["stream_ann_pq_stored_topk"] = QueryDef(
    stream_ann_pq_stored_topk, _stream_ann_sql(),
    doc="query stream ADC-served from the cell-partitioned stored "
        "IVF-PQ index; per-batch I/O bound by the probed cells' "
        "code rows")


def stream_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming BM25 search (streaming/retrieval.py stream_bm25_topk):
    the inverted index, term stats and corpus scalars are staged to
    parquet once (the stored serving artifacts); the 3 text queries
    then replay as a 2-file stream and each micro-batch joins only its
    terms' postings. Shares text_bm25_topk's oracle verbatim
    (queries/text.py) -- the served stream must return the identical
    ranking the batch search computes."""
    from ..operators import retrieval as R
    from ..operators.text import tokenize_ws
    from ..streaming import (read_stream_parquet, run_available_now,
                             stream_bm25_topk)

    d = tbl(spark, sf, "documents")
    postings = R.bm25_index(d)
    ts_df, cs_df = R.bm25_corpus_stats(postings)
    queries = (d.where(F.col("doc_id") < 3)
               .select(F.col("doc_id").alias("q_id"),
                       F.array_join(F.slice(tokenize_ws("text"), 1, 8),
                                    " ").alias("q_text")))
    stage = f"/tmp/bodo_spark_sbm25_{uuid.uuid4().hex[:8]}"
    try:
        postings.write.mode("overwrite").parquet(f"{stage}/idx")
        ts_df.write.mode("overwrite").parquet(f"{stage}/ts")
        cs = cs_df.collect()[0]  # two scalars: the stored stats artifact
        queries.repartition(2).write.mode("overwrite") \
            .parquet(f"{stage}/q")
        idx = spark.read.parquet(f"{stage}/idx")
        tstats = spark.read.parquet(f"{stage}/ts")
        stream = read_stream_parquet(spark, f"{stage}/q", queries.schema,
                                     max_files_per_trigger=1)
        topk = stream_bm25_topk(stream, idx, tstats,
                                (cs["n_docs"], cs["sum_dl"]), k=5)
        res = run_available_now(topk, f"t_sbm25_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        return res.orderBy("q_id", "rn")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_bm25_sql() -> str:
    from .text import _bm25_sql
    return _bm25_sql()


QUERIES["stream_bm25_search"] = QueryDef(stream_bm25_search,
                                         _stream_bm25_sql())


def stream_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming conversion funnel (streaming/stateful.py
    funnel_stream_stateful): events replay as a 2-file stream (a
    user's events SPLIT across micro-batches, so the per-user event
    buffer genuinely accumulates in GroupState); the final per-user
    update -- stage is monotone, so max == last -- must equal the
    batch fold. Shares dt_funnel_stages' oracle verbatim
    (queries/datetimes.py)."""
    from ..streaming import (funnel_stream_stateful, read_stream_parquet,
                             run_available_now)

    e = tbl(spark, sf, "events")
    stage = f"/tmp/bodo_spark_sfun_{uuid.uuid4().hex[:8]}"
    try:
        (e.select("event_id", "ts", "user_id", "event_type")
         .repartition(2).write.mode("overwrite").parquet(f"{stage}/e"))
        src = spark.read.parquet(f"{stage}/e")
        stream = read_stream_parquet(spark, f"{stage}/e", src.schema,
                                     max_files_per_trigger=1)
        st = funnel_stream_stateful(stream,
                                    ["view", "click", "purchase"])
        res = run_available_now(st, f"t_sfun_{uuid.uuid4().hex[:8]}",
                                output_mode="update")
        final = (res.groupBy("user_id")
                 .agg(F.max("stage").alias("stage")))
        return (final.groupBy("stage").agg(
            F.count(F.lit(1)).alias("n_users"),
            F.bit_xor("user_id").alias("uid_xor"))
            .orderBy("stage"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _stream_funnel_sql() -> str:
    from .datetimes import _DT_FUNNEL_SQL
    return _DT_FUNNEL_SQL


QUERIES["stream_funnel"] = QueryDef(stream_funnel, _stream_funnel_sql())


def stream_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC apply (streaming/cdc.py apply_cdc_stream): a
    customer dimension is maintained from a replayed change stream --
    upserts (two versions of some keys, split ACROSS micro-batches),
    deletes (some in the same batch as a newer upsert for the same
    key), and brand-new keys -- each micro-batch applied as ONE
    seq-guarded MERGE with a conditional insert. The oracle derives
    the final table as global last-change-per-key over the whole
    stream; sequential batch application must land on the identical
    state."""
    from ..streaming import apply_cdc_stream, read_stream_parquet

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"))
    stage = f"/tmp/bodo_spark_cdc_{uuid.uuid4().hex[:8]}"
    try:
        (c.withColumn("_cdc_seq", F.lit(0).cast("long"))
         .write.mode("overwrite").parquet(f"{stage}/tbl"))

        def ch(pred, seg, op, seq, shift=0):
            return (c.where(pred)
                    .select((F.col("k") + shift).alias("k"),
                            seg.alias("seg"), F.lit(op).alias("op"),
                            F.lit(seq).cast("long").alias("seq")))

        batch_a = ch(F.col("k") % 3 == 0, F.lit("SEG_V1"), "U", 1) \
            .unionByName(ch(F.col("k") < 5, F.lit("NEWSEG"), "U", 1,
                            shift=1_000_000))
        batch_b = ch(F.col("k") % 6 == 0, F.lit("SEG_V2"), "U", 2) \
            .unionByName(ch(F.col("k") % 5 == 0,
                            F.lit(None).cast("string"), "D", 3))
        batch_a.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        batch_b.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        src = spark.read.parquet(f"{stage}/ch")
        stream = read_stream_parquet(spark, f"{stage}/ch", src.schema,
                                     max_files_per_trigger=1)
        apply_cdc_stream(stream, f"{stage}/tbl", key_cols=["k"],
                         query_name=f"cdc_{uuid.uuid4().hex[:8]}")
        agg = (spark.read.parquet(f"{stage}/tbl")
               .groupBy("seg").agg(
                   F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor("k").alias("key_xor"),
                   F.max("_cdc_seq").alias("max_seq"))
               .orderBy("seg"))
        rows = [tuple(r) for r in agg.collect()]
        return local_df(
            spark,
            rows, "seg string, n_rows bigint, key_xor bigint, "
                  "max_seq bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(f"{stage}/tbl__cdc_ckpt", ignore_errors=True)


_STREAM_CDC_SQL = """
WITH init AS (
  SELECT c_custkey AS k, c_mktsegment AS seg, CAST(0 AS BIGINT) AS sq
  FROM customer),
ch AS (
  SELECT c_custkey AS k, 'SEG_V1' AS seg, 'U' AS op,
         CAST(1 AS BIGINT) AS sq
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', 'U', 1 FROM customer
  WHERE c_custkey < 5
  UNION ALL
  SELECT c_custkey, 'SEG_V2', 'U', 2 FROM customer
  WHERE c_custkey % 6 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), 'D', 3 FROM customer
  WHERE c_custkey % 5 = 0),
last AS (
  SELECT k, seg, op, sq,
         row_number() OVER (PARTITION BY k ORDER BY sq DESC) AS rn
  FROM ch QUALIFY rn = 1),
final AS (
  SELECT COALESCE(l.k, i.k) AS k,
         CASE WHEN l.k IS NULL THEN i.seg ELSE l.seg END AS seg,
         CASE WHEN l.k IS NULL THEN i.sq ELSE l.sq END AS sq
  FROM init i FULL OUTER JOIN last l ON i.k = l.k
  WHERE COALESCE(l.op, 'U') <> 'D')
SELECT seg, COUNT(*) AS n_rows, bit_xor(k) AS key_xor,
       MAX(sq) AS max_seq
FROM final GROUP BY seg ORDER BY seg
"""


QUERIES["stream_cdc_apply"] = QueryDef(stream_cdc_apply, _STREAM_CDC_SQL)


def stream_cdc_apply_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """File-pruned streaming CDC apply: the SAME change stream and the
    SAME oracle as stream_cdc_apply, but the dimension table is stored
    hash-bucket-partitioned on the key (merge.write_bucket_partitioned,
    16 buckets) and every micro-batch MERGEs through
    merge_into_partitioned -- only the buckets the batch's keys hash to
    are read and rewritten, so the per-batch cost is bound by the
    touched-partition size instead of the table size. Value parity
    with the plain COW mode is exactly what this gate pins."""
    from ..operators.merge import write_bucket_partitioned
    from ..streaming import apply_cdc_stream, read_stream_parquet

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"))
    stage = f"/tmp/bodo_spark_cdcp_{uuid.uuid4().hex[:8]}"
    try:
        write_bucket_partitioned(
            c.withColumn("_cdc_seq", F.lit(0).cast("long")),
            f"{stage}/tbl", ["k"], 16)

        def ch(pred, seg, op, seq, shift=0):
            return (c.where(pred)
                    .select((F.col("k") + shift).alias("k"),
                            seg.alias("seg"), F.lit(op).alias("op"),
                            F.lit(seq).cast("long").alias("seq")))

        batch_a = ch(F.col("k") % 3 == 0, F.lit("SEG_V1"), "U", 1) \
            .unionByName(ch(F.col("k") < 5, F.lit("NEWSEG"), "U", 1,
                            shift=1_000_000))
        batch_b = ch(F.col("k") % 6 == 0, F.lit("SEG_V2"), "U", 2) \
            .unionByName(ch(F.col("k") % 5 == 0,
                            F.lit(None).cast("string"), "D", 3))
        batch_a.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        batch_b.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        src = spark.read.parquet(f"{stage}/ch")
        stream = read_stream_parquet(spark, f"{stage}/ch", src.schema,
                                     max_files_per_trigger=1)
        apply_cdc_stream(stream, f"{stage}/tbl", key_cols=["k"],
                         n_buckets=16,
                         query_name=f"cdcp_{uuid.uuid4().hex[:8]}")
        agg = (spark.read.parquet(f"{stage}/tbl").drop("mbucket")
               .groupBy("seg").agg(
                   F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor("k").alias("key_xor"),
                   F.max("_cdc_seq").alias("max_seq"))
               .orderBy("seg"))
        rows = [tuple(r) for r in agg.collect()]
        return local_df(
            spark,
            rows, "seg string, n_rows bigint, key_xor bigint, "
                  "max_seq bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(f"{stage}/tbl__cdc_ckpt", ignore_errors=True)


QUERIES["stream_cdc_apply_pruned"] = QueryDef(
    stream_cdc_apply_pruned, _STREAM_CDC_SQL,
    doc="file-pruned streaming CDC apply (bucket-partitioned MERGE)")


def stream_cdc_apply_mor(spark: SparkSession, sf: str) -> DataFrame:
    """Merge-on-read streaming CDC apply (operators/mor.py): the SAME
    change stream and the SAME oracle as the two COW modes, but each
    micro-batch is ONE O(batch) delta-segment append -- nothing is
    read or rewritten at apply time -- with a mid-stream compaction
    (compact_every=2) folding the log into the base, and the final
    state read through the reconcile (latest seq per key, delete-wins,
    tombstones persist). Three MERGE designs, one pinned state."""
    from ..operators import mor as M
    from ..streaming import read_stream_parquet

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"))
    stage = f"/tmp/bodo_spark_cdcm_{uuid.uuid4().hex[:8]}"
    try:
        M.mor_init(c.withColumn("_cdc_seq", F.lit(0).cast("long")),
                   f"{stage}/tbl")

        def ch(pred, seg, op, seq, shift=0):
            return (c.where(pred)
                    .select((F.col("k") + shift).alias("k"),
                            seg.alias("seg"), F.lit(op).alias("op"),
                            F.lit(seq).cast("long").alias("seq")))

        batch_a = ch(F.col("k") % 3 == 0, F.lit("SEG_V1"), "U", 1) \
            .unionByName(ch(F.col("k") < 5, F.lit("NEWSEG"), "U", 1,
                            shift=1_000_000))
        batch_b = ch(F.col("k") % 6 == 0, F.lit("SEG_V2"), "U", 2) \
            .unionByName(ch(F.col("k") % 5 == 0,
                            F.lit(None).cast("string"), "D", 3))
        batch_a.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        batch_b.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        src = spark.read.parquet(f"{stage}/ch")
        stream = read_stream_parquet(spark, f"{stage}/ch", src.schema,
                                     max_files_per_trigger=1)
        M.apply_cdc_stream_mor(stream, f"{stage}/tbl", key_cols=["k"],
                               compact_every=2,
                               query_name=f"cdcm_{uuid.uuid4().hex[:8]}")
        agg = (M.mor_read(spark, f"{stage}/tbl", key_cols=["k"])
               .groupBy("seg").agg(
                   F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor("k").alias("key_xor"),
                   F.max("_cdc_seq").alias("max_seq"))
               .orderBy("seg"))
        rows = [tuple(r) for r in agg.collect()]
        return local_df(
            spark,
            rows, "seg string, n_rows bigint, key_xor bigint, "
                  "max_seq bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(f"{stage}/tbl__mor_ckpt", ignore_errors=True)


QUERIES["stream_cdc_apply_mor"] = QueryDef(
    stream_cdc_apply_mor, _STREAM_CDC_SQL,
    doc="merge-on-read streaming CDC: O(batch) delta appends + "
        "read-time reconcile + mid-stream compaction")


def stream_cdc_apply_mor_maintained(spark: SparkSession,
                                    sf: str) -> DataFrame:
    """SELF-MAINTAINING merge-on-read streaming CDC ingest
    (operators/mor.py apply_cdc_stream_mor(max_delta_fraction=) ->
    mor_maintain): the SAME change stream and oracle as the other CDC
    modes, but maintenance is keyed off the table's own on-disk BYTE
    amplification after every micro-batch instead of a caller-chosen
    cadence -- the ingest loop a 100-TB pipeline runs unattended
    (segment count misses batch-size variance; the byte budget does
    not). A fraction of 0.0 forces the fold after each batch, so the
    gate additionally pins an EMPTY delta log at stream end: the state
    must come out of maintained bases alone."""
    from ..operators import mor as M
    from ..streaming import read_stream_parquet

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"))
    stage = f"/tmp/bodo_spark_cdcmm_{uuid.uuid4().hex[:8]}"
    try:
        M.mor_init(c.withColumn("_cdc_seq", F.lit(0).cast("long")),
                   f"{stage}/tbl")

        def ch(pred, seg, op, seq, shift=0):
            return (c.where(pred)
                    .select((F.col("k") + shift).alias("k"),
                            seg.alias("seg"), F.lit(op).alias("op"),
                            F.lit(seq).cast("long").alias("seq")))

        batch_a = ch(F.col("k") % 3 == 0, F.lit("SEG_V1"), "U", 1) \
            .unionByName(ch(F.col("k") < 5, F.lit("NEWSEG"), "U", 1,
                            shift=1_000_000))
        batch_b = ch(F.col("k") % 6 == 0, F.lit("SEG_V2"), "U", 2) \
            .unionByName(ch(F.col("k") % 5 == 0,
                            F.lit(None).cast("string"), "D", 3))
        batch_a.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        batch_b.coalesce(1).write.mode("append").parquet(f"{stage}/ch")
        src = spark.read.parquet(f"{stage}/ch")
        stream = read_stream_parquet(spark, f"{stage}/ch", src.schema,
                                     max_files_per_trigger=1)
        M.apply_cdc_stream_mor(
            stream, f"{stage}/tbl", key_cols=["k"],
            max_delta_fraction=0.0,
            query_name=f"cdcmm_{uuid.uuid4().hex[:8]}")
        assert M.mor_delta_stats(
            spark, f"{stage}/tbl")["n_segments"] == 0, \
            "self-maintenance left live delta segments"
        agg = (M.mor_read(spark, f"{stage}/tbl", key_cols=["k"])
               .groupBy("seg").agg(
                   F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor("k").alias("key_xor"),
                   F.max("_cdc_seq").alias("max_seq"))
               .orderBy("seg"))
        rows = [tuple(r) for r in agg.collect()]
        return local_df(
            spark,
            rows, "seg string, n_rows bigint, key_xor bigint, "
                  "max_seq bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(f"{stage}/tbl__mor_ckpt", ignore_errors=True)


QUERIES["stream_cdc_apply_mor_maintained"] = QueryDef(
    stream_cdc_apply_mor_maintained, _STREAM_CDC_SQL,
    doc="self-maintaining MoR streaming CDC: byte-amplification-"
        "budgeted mor_maintain after every micro-batch; empty delta "
        "log pinned at stream end")


def stream_cdc_apply_mor_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed MoR: the same CDC machinery as stream_cdc_apply_mor,
    but the MoR BASE is key-hash-bucket partitioned (256 dirs) and the
    change mass is SPARSE (~25 keys), so compaction folds the delta
    log into ONLY the touched bucket directories
    (merge._publish_partitions) -- compaction cost bound by the change
    mass, not the base size. The gate pins (a) the folded state
    against a full CDC-fold oracle and (b) the untouched bucket files
    physically byte-identical across the compaction."""
    import glob as g
    import os

    from ..operators import mor as M
    from ..operators.merge import _bucket_expr

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"))
    stage = f"/tmp/bodo_spark_cdcmb_{uuid.uuid4().hex[:8]}"
    try:
        M.mor_init(c.withColumn("_cdc_seq", F.lit(0).cast("long")),
                   f"{stage}/tbl", key_cols=["k"], n_buckets=256)

        def ch(pred, seg, op, seq, shift=0):
            return (c.where(pred)
                    .select((F.col("k") + shift).alias("k"),
                            seg.alias("seg"), F.lit(op).alias("op"),
                            F.lit(seq).cast("long").alias("seq")))

        batch_a = ch(F.col("k") % 100 == 0, F.lit("SEG_V1"), "U", 1) \
            .unionByName(ch(F.col("k") < 5, F.lit("NEWSEG"), "U", 1,
                            shift=1_000_000))
        batch_b = ch(F.col("k") % 200 == 0, F.lit("SEG_V2"), "U", 2) \
            .unionByName(ch(F.col("k") % 500 == 0,
                            F.lit(None).cast("string"), "D", 3))
        M.mor_apply(batch_a, f"{stage}/tbl", key_cols=["k"])
        M.mor_apply(batch_b, f"{stage}/tbl", key_cols=["k"])
        touched = {r[0] for r in batch_a.unionByName(batch_b)
                   .select(_bucket_expr(["k"], 256).alias("b"))
                   .distinct().collect()}
        tdirs = [f"mbucket={t}" for t in touched]

        def files():
            return {(p, os.path.getmtime(p), os.path.getsize(p))
                    for p in g.glob(os.path.join(
                        stage, "tbl", "base", "**", "*.parquet"),
                        recursive=True)
                    if not any(os.sep + d + os.sep in p
                               for d in tdirs)}

        before = files()
        M.mor_compact(spark, f"{stage}/tbl", key_cols=["k"])
        intact = (files() == before and len(touched) < 256
                  and M.mor_delta_stats(spark,
                                        f"{stage}/tbl")["n_segments"] == 0)
        agg = (M.mor_read(spark, f"{stage}/tbl", key_cols=["k"])
               .groupBy("seg").agg(
                   F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor("k").alias("key_xor"),
                   F.max("_cdc_seq").alias("max_seq"))
               .withColumn("untouched_intact", F.lit(bool(intact)))
               .orderBy("seg"))
        rows = [tuple(r) for r in agg.collect()]
        return local_df(
            spark,
            rows, "seg string, n_rows bigint, key_xor bigint, "
                  "max_seq bigint, untouched_intact boolean")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_STREAM_CDC_BUCKETED_SQL = """
WITH init AS (
  SELECT c_custkey AS k, c_mktsegment AS seg, CAST(0 AS BIGINT) AS sq
  FROM customer),
ch AS (
  SELECT c_custkey AS k, 'SEG_V1' AS seg, 'U' AS op,
         CAST(1 AS BIGINT) AS sq
  FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', 'U', 1 FROM customer
  WHERE c_custkey < 5
  UNION ALL
  SELECT c_custkey, 'SEG_V2', 'U', 2 FROM customer
  WHERE c_custkey % 200 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), 'D', 3 FROM customer
  WHERE c_custkey % 500 = 0),
last AS (
  SELECT k, seg, op, sq,
         row_number() OVER (PARTITION BY k ORDER BY sq DESC) AS rn
  FROM ch QUALIFY rn = 1),
final AS (
  SELECT COALESCE(l.k, i.k) AS k,
         CASE WHEN l.k IS NULL THEN i.seg ELSE l.seg END AS seg,
         CASE WHEN l.k IS NULL THEN i.sq ELSE l.sq END AS sq
  FROM init i FULL OUTER JOIN last l ON i.k = l.k
  WHERE COALESCE(l.op, 'U') <> 'D')
SELECT seg, COUNT(*) AS n_rows, bit_xor(k) AS key_xor,
       MAX(sq) AS max_seq, TRUE AS untouched_intact
FROM final GROUP BY seg ORDER BY seg
"""

QUERIES["stream_cdc_apply_mor_bucketed"] = QueryDef(
    stream_cdc_apply_mor_bucketed, _STREAM_CDC_BUCKETED_SQL,
    doc="bucketed MoR CDC: compaction folds deltas into ONLY the "
        "touched bucket dirs; untouched files pinned byte-identical")


def stream_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming rollup maintenance (streaming/cdc.py
    maintain_rollup_stream): order facts replay as a 2-file stream;
    each micro-batch aggregates to the per-priority grain and folds
    into the stored rollup. Shares merge_rollup_incremental's one-shot
    oracle verbatim -- the streamed rollup must equal aggregating
    everything at once (additive DECIMAL measures keep it exact)."""
    from ..streaming import maintain_rollup_stream, read_stream_parquet

    o = tbl(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").alias("price"))
    stage = f"/tmp/bodo_spark_srup_{uuid.uuid4().hex[:8]}"
    try:
        empty = (o.groupBy("o_orderpriority")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                      F.sum(F.col("price").cast("decimal(12,2)"))
                      .alias("sum_price"))
                 .where(F.lit(False)))
        empty.write.mode("overwrite").parquet(f"{stage}/tbl")
        o.where(F.col("o_orderkey") % 2 == 0).coalesce(1).write \
            .mode("append").parquet(f"{stage}/facts")
        o.where(F.col("o_orderkey") % 2 != 0).coalesce(1).write \
            .mode("append").parquet(f"{stage}/facts")
        src = spark.read.parquet(f"{stage}/facts")
        stream = read_stream_parquet(spark, f"{stage}/facts", src.schema,
                                     max_files_per_trigger=1)
        maintain_rollup_stream(
            stream, f"{stage}/tbl",
            keys=["o_orderpriority"],
            aggs={"n_orders": F.count(F.lit(1)).cast("bigint"),
                  "sum_price": F.sum(F.col("price")
                                     .cast("decimal(12,2)"))},
            add_cols=["n_orders", "sum_price"],
            query_name=f"rup_{uuid.uuid4().hex[:8]}")
        final = (spark.read.parquet(f"{stage}/tbl")
                 .select("o_orderpriority", "n_orders",
                         F.col("sum_price").cast("double")
                         .alias("sum_price"))
                 .orderBy("o_orderpriority"))
        rows = [tuple(r) for r in final.collect()]
        return local_df(
            spark,
            rows, "o_orderpriority string, n_orders bigint, "
                  "sum_price double")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(f"{stage}/tbl__rollup_ckpt", ignore_errors=True)


def _stream_rollup_sql() -> str:
    from .merge_ops import _ROLLUP_SQL
    return _ROLLUP_SQL


QUERIES["stream_rollup"] = QueryDef(stream_rollup, _stream_rollup_sql())
