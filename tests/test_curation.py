"""Unit tests for the corpus-curation operators (decontamination,
sequence packing, domain mixing, PII redaction). The DuckDB-oracle
equivalence of the gate queries is covered by bodo_spark.verify; these
pin the operator semantics directly on constructed inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bodo_spark.operators import curation as C

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_drops_exact_gram_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(spark, [
        (1, "x alpha beta gamma delta epsilon y"),   # contains a bench 5-gram
        (2, "alpha beta gamma x delta epsilon"),     # only shorter overlaps
        (3, "totally unrelated words here now ok"),
    ])
    bad = {r.doc_id for r in
           C.contaminated_ids(train, bench, k=5).collect()}
    assert bad == {1}
    kept = {r.doc_id for r in C.decontaminate(train, bench, k=5).collect()}
    assert kept == {2, 3}


def test_decontaminate_short_doc_whole_text_fallback(spark):
    # docs shorter than k compare as whole trimmed text (word_shingles
    # fallback): an exact short dup is caught, a near-miss is not
    bench = _docs(spark, [(100, "tiny eval prompt")])
    train = _docs(spark, [(1, "  tiny eval prompt "), (2, "tiny eval")])
    bad = {r.doc_id for r in
           C.contaminated_ids(train, bench, k=13).collect()}
    assert bad == {1}


def test_global_offsets_matches_serial_cumsum(spark):
    rows = [(i, (7 * i) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    out = {r.id: r.offset for r in
           C.global_offsets(df, order_col="id", val_col="v",
                            num_partitions=7).collect()}
    acc = 0
    for i, v in rows:
        assert out[i] == acc, f"id {i}: {out[i]} != {acc}"
        acc += v


def test_pack_chunks_boundary_semantics(spark):
    # capacity 10; docs of 4,4,4 tokens: doc 2 spans chunks 0 and 1
    df = spark.createDataFrame(
        [(0, 4), (1, 4), (2, 4)], "doc_id bigint, n bigint")
    out = C.pack_chunks(df, 10, id_col="doc_id", tokens_col="n")
    got = sorted((r.doc_id, r.chunk_id) for r in out.collect())
    assert got == [(0, 0), (1, 0), (2, 0), (2, 1)]


def test_pack_chunks_zero_token_doc_occupies_one(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 5)], "doc_id bigint, n bigint")
    out = C.pack_chunks(df, 10, id_col="doc_id", tokens_col="n")
    got = sorted((r.doc_id, r.chunk_id) for r in out.collect())
    # doc 1 has offset 10 -> chunk 1, never an empty/descending sequence
    assert got == [(0, 0), (1, 1), (2, 1)]


def test_domain_mix_hits_target_proportions(spark):
    rows = [(i, "a" if i < 4000 else "b") for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = C.domain_mix_sample(df, {"a": 1.0, "b": 1.0},
                              domain_col="source", id_col="doc_id")
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # budget = min(4000/1, 2000/1) = 2000 per domain; b keeps all,
    # a keeps half (hash sampler is uniform-ish, allow 5% slack)
    assert counts["b"] == 2000
    assert abs(counts["a"] - 2000) < 100
    # determinism: second run identical ids
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in C.domain_mix_sample(
        df, {"a": 1.0, "b": 1.0}, domain_col="source",
        id_col="doc_id").collect())
    assert ids1 == ids2


def test_domain_mix_drops_unweighted_domains(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, source string")
    out = C.domain_mix_sample(df, {"a": 1.0, "b": 1.0},
                              domain_col="source", id_col="doc_id")
    assert {r.source for r in out.collect()} <= {"a", "b"}


@pytest.mark.parametrize("raw,expect", [
    ("mail me at jo.doe+x@sub.example.co.uk now",
     "mail me at <EMAIL> now"),
    ("server 192.168.0.1 and 10.0.255.3", "server <IP> and <IP>"),
    ("call +1 555 0147 90 today", "call <PHONE> today"),
    ("no pii here", "no pii here"),
])
def test_redact_pii_patterns(spark, raw, expect):
    got = (spark.range(1).select(
        C.redact_pii(F.lit(raw)).alias("r")).collect()[0].r)
    assert got == expect


def test_redact_pii_order_ip_before_phone(spark):
    # a dotted quad must become <IP>, not be half-eaten by the phone rule
    got = (spark.range(1).select(
        C.redact_pii(F.lit("x 12.34.56.78 y")).alias("r")).collect()[0].r)
    assert got == "x <IP> y"


def test_shuffle_shards_sizes_and_determinism(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = C.shuffle_shards(df, 64, id_col="doc_id")
    sizes = {r.shard_id: r.n for r in
             out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    # 1000 docs / 64 -> 15 full shards + one of 40
    assert sorted(sizes) == list(range(16))
    assert all(sizes[s] == 64 for s in range(15)) and sizes[15] == 40
    # shard membership is a function of the id, not of run/partitioning
    m1 = sorted((r.doc_id, r.shard_id) for r in out.collect())
    m2 = sorted((r.doc_id, r.shard_id) for r in C.shuffle_shards(
        df.repartition(3), 64, id_col="doc_id").collect())
    assert m1 == m2
    # it is a shuffle: no shard is a contiguous id range
    by_shard: dict[int, list[int]] = {}
    for i, s in m1:
        by_shard.setdefault(s, []).append(i)
    contiguous = sum(1 for ids in by_shard.values()
                     if max(ids) - min(ids) == len(ids) - 1)
    assert contiguous == 0


def test_pack_chunks_every_chunk_nonempty_on_corpus(spark):
    # concat-and-chunk invariant on real data: chunk ids are the dense
    # range [0, n_chunks)
    from bodo_spark.operators.text import token_count
    from bodo_spark.queries._util import tbl
    d = (tbl(spark, SF_DIR, "documents")
         .withColumn("n", token_count("text")).select("doc_id", "n"))
    chunks = (C.pack_chunks(d, 256, id_col="doc_id", tokens_col="n")
              .select("chunk_id").distinct())
    mx, n = chunks.agg(F.max("chunk_id"), F.count("*")).collect()[0]
    assert n == mx + 1


def test_leakage_free_split_clusters_never_straddle(spark):
    # pairs chain 1-2-3 into one cluster; 4,5 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "doc_id bigint")
    out = C.leakage_free_split(docs, pairs)
    splits = {r.doc_id: r.split for r in out.collect()}
    assert splits[1] == splits[2] == splits[3]
    assert set(splits.values()) <= {"train", "val", "test"}
    # deterministic across runs and input partitioning
    again = {r.doc_id: r.split for r in
             C.leakage_free_split(docs.repartition(3), pairs).collect()}
    assert splits == again


def test_leakage_free_split_respects_weights(spark):
    docs = spark.range(1, 5001).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = C.leakage_free_split(docs, pairs)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] - 4000) < 200
    assert abs(counts.get("val", 0) - 500) < 120
    assert abs(counts.get("test", 0) - 500) < 120


def test_domain_mix_token_weighted_budget(spark):
    # domain a: 100 docs x 10 tokens = 1000; b: 100 docs x 30 = 3000.
    # equal weights -> budget 1000 tokens/domain: keep all of a,
    # ~1/3 of b (by expectation)
    rows = ([(i, "a", 10) for i in range(100)]
            + [(1000 + i, "b", 30) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n bigint")
    out = C.domain_mix_sample(df, {"a": 1.0, "b": 1.0},
                              domain_col="source", id_col="doc_id",
                              size_col="n")
    kept = {r.source: r.cnt for r in
            out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert kept["a"] == 100
    assert 15 <= kept["b"] <= 50  # ~33 expected, hash-sampler slack
