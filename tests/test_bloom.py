"""Bloom-filter exact-dedup ingest (operators/bloom.py): exactness vs
the plain anti join (including under a deliberately saturated filter
where nearly every probe is a false positive), index build/append/
compact round-trips, and the definite-new fast path."""

from __future__ import annotations

import glob
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from bodo_spark.operators import bloom as B


def _frame(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "id long, text string")


def _anti(batch, corpus):
    b = batch.withColumn("_k", F.md5("text"))
    c = corpus.select(F.md5("text").alias("_k")).distinct()
    return b.join(c, "_k", "left_anti").drop("_k")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


CORPUS = [(i, f"corpus doc number {i} body") for i in range(50)]
BATCH = ([(100 + i, f"batch fresh doc {i}") for i in range(10)]
         + [(200 + i, f"corpus doc number {i} body") for i in range(0, 20, 3)])


def test_params_sane():
    m, k = B.bloom_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1% fpp
    assert 5 <= k <= 10


def test_exact_new_rows_matches_anti_join(spark):
    corpus, batch = _frame(spark, CORPUS), _frame(spark, BATCH)
    m, k = B.bloom_params(len(CORPUS), 0.01)
    words = B.bloom_word_table(corpus, F.md5("text"), m_bits=m, k=k)
    got = B.exact_new_rows(batch, corpus, F.md5("text"), F.md5("text"),
                           words=words, m_bits=m, k=k)
    assert _ids(got) == _ids(_anti(batch, corpus))
    # the replayed texts were dropped, the fresh ones kept
    assert all(i >= 100 and i < 200 for i in _ids(got))


def test_exact_under_saturated_filter(spark):
    """m=64 forces nearly every probe to collide (fpp ~ 1): every batch
    row goes down the confirm path, and the result must STILL equal the
    anti join -- exactness never depends on sizing."""
    corpus, batch = _frame(spark, CORPUS), _frame(spark, BATCH)
    words = B.bloom_word_table(corpus, F.md5("text"), m_bits=64, k=2)
    got = B.exact_new_rows(batch, corpus, F.md5("text"), F.md5("text"),
                           words=words, m_bits=64, k=2)
    assert _ids(got) == _ids(_anti(batch, corpus))


def test_definite_new_skips_confirm(spark):
    """A batch with no duplicates: every row is a Bloom 'no', so the
    maybe set (and hence the corpus-confirm work) is empty."""
    corpus = _frame(spark, CORPUS)
    fresh = _frame(spark, [(900 + i, f"totally new text {i} xyz")
                           for i in range(5)])
    m, k = B.bloom_params(len(CORPUS), 0.001)
    words = B.bloom_word_table(corpus, F.md5("text"), m_bits=m, k=k)
    flagged = B.bloom_candidates(fresh, words, F.md5("text"),
                                 m_bits=m, k=k)
    assert flagged.where(F.col("_maybe_dup")).count() == 0
    got = B.exact_new_rows(fresh, corpus, F.md5("text"), F.md5("text"),
                           words=words, m_bits=m, k=k)
    assert got.count() == 5


def test_append_equals_one_shot_and_compact(spark):
    """Two-segment LSM append folds to the identical word table as the
    one-shot build; compaction rewrites to one file with values
    unchanged."""
    corpus = _frame(spark, CORPUS)
    a = corpus.where(F.col("id") % 2 == 0)
    b = corpus.where(F.col("id") % 2 == 1)
    m, k = 1 << 12, 4
    stage = f"/tmp/bodo_spark_test_bloom_{uuid.uuid4().hex[:8]}"
    try:
        B.write_bloom_index(a, stage, F.md5("text"), m_bits=m, k=k)
        B.append_bloom_index(b, stage, F.md5("text"), m_bits=m, k=k)
        folded = {r["word_idx"]: r["word"]
                  for r in B.read_bloom_index(spark, stage).collect()}
        oneshot = {r["word_idx"]: r["word"]
                   for r in B.bloom_word_table(
                       corpus, F.md5("text"), m_bits=m, k=k).collect()}
        assert folded == oneshot
        B.append_bloom_index(
            spark.createDataFrame([], "id long, text string"), stage,
            F.md5("text"), m_bits=m, k=k, compact_after=True)
        assert len(glob.glob(f"{stage}/*.parquet")) == 1
        refolded = {r["word_idx"]: r["word"]
                    for r in B.read_bloom_index(spark, stage).collect()}
        assert refolded == oneshot
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_batch_internal_duplicates_preserved(spark):
    """Anti-join semantics: two batch rows with the same (new) text both
    survive -- the operator dedups against the corpus, not the batch."""
    corpus = _frame(spark, CORPUS)
    batch = _frame(spark, [(300, "same new text"), (301, "same new text")])
    m, k = B.bloom_params(len(CORPUS), 0.01)
    words = B.bloom_word_table(corpus, F.md5("text"), m_bits=m, k=k)
    got = B.exact_new_rows(batch, corpus, F.md5("text"), F.md5("text"),
                           words=words, m_bits=m, k=k)
    assert _ids(got) == [300, 301]


def test_probe_tolerates_raw_multisegment_index(spark):
    """A caller handing the probe a RAW multi-segment appended index
    (plain spark.read.parquet instead of read_bloom_index) must still
    get bit-for-bit anti-join results: probe_hit_flag folds the word
    table defensively, so duplicate word_idx rows can't multiply batch
    rows through the k equi-joins."""
    corpus, batch = _frame(spark, CORPUS), _frame(spark, BATCH)
    a = corpus.where(F.col("id") % 2 == 0)
    b = corpus.where(F.col("id") % 2 == 1)
    m, k = 1 << 12, 4
    stage = f"/tmp/bodo_spark_test_bloom_{uuid.uuid4().hex[:8]}"
    try:
        B.write_bloom_index(a, stage, F.md5("text"), m_bits=m, k=k)
        B.append_bloom_index(b, stage, F.md5("text"), m_bits=m, k=k)
        raw = spark.read.parquet(stage)  # unfolded: duplicate word_idx
        assert raw.count() > raw.select("word_idx").distinct().count()
        got = B.exact_new_rows(batch, corpus, F.md5("text"),
                               F.md5("text"), words=raw, m_bits=m, k=k)
        assert _ids(got) == _ids(_anti(batch, corpus))
        assert got.count() == len(_ids(got))  # no row multiplication
    finally:
        shutil.rmtree(stage, ignore_errors=True)
