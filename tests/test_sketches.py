"""Sketch-profiling operators (operators/sketches.py): exact-regime
equality with groupBy ground truth, shard-sketch-then-merge equivalence,
and partitioning-invariance of the mergeable states."""

from __future__ import annotations

from pyspark.sql import functions as F

from bodo_spark.operators import sketches as SK


def _df(spark):
    rows = [(i % 13, i % 4, float(i % 97)) for i in range(5000)]
    return spark.createDataFrame(rows, "tok long, shard int, v double")


def _exact_freq(df):
    return {(r["tok"], r["n"]) for r in
            df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}


def test_top_k_exact_regime_matches_groupby(spark):
    df = _df(spark)
    got = {(r["item"], r["cnt"]) for r in
           SK.top_k_items(df, "tok", k=100, max_tracked=100).collect()}
    assert got == _exact_freq(df)


def test_shard_sketches_merge_equals_one_shot(spark):
    """Sketch each shard independently, combine -- identical table to
    sketching the whole frame (the mergeability contract)."""
    df = _df(spark)
    one = {(r["item"], r["cnt"]) for r in
           SK.top_k_items(df, "tok", k=100, max_tracked=100).collect()}
    sh = SK.top_k_shard_sketches(df, "tok", "shard", max_tracked=100)
    merged = {(r["item"], r["cnt"]) for r in
              SK.top_k_merge(sh, k=100, max_tracked=100).collect()}
    assert merged == one


def test_theta_union_equals_exact_distinct(spark):
    df = _df(spark)
    exact = df.select("tok").distinct().count()
    assert SK.theta_ndv(df, "tok").collect()[0]["ndv"] == exact
    assert SK.theta_union_ndv(df, "tok", "shard").collect()[0]["ndv"] == exact


def test_hll_deterministic_across_partitionings(spark):
    df = _df(spark)
    a = SK.hll_ndv(df.repartition(2), "tok").collect()[0]["ndv_est"]
    b = SK.hll_ndv(df.repartition(17), "tok").collect()[0]["ndv_est"]
    assert a == b  # slot merges commute; fixed data -> fixed estimate


def test_kll_quantiles_within_rank_envelope(spark):
    df = _df(spark)
    n = df.count()
    for r in SK.kll_quantiles(df, "v", [0.25, 0.5, 0.9], k=200).collect():
        rank = df.where(F.col("v") <= r["value"]).count() / n
        # k=200 -> ~1.65% rank error; +value-mass granularity of the
        # 97-value domain
        assert abs(rank - r["prob"]) <= 0.05, (r, rank)


def test_shard_sketch_parquet_roundtrip_merge(spark, tmp_path_factory):
    """The shard sketch is a durable artifact: binary states written to
    parquet, appended with a new shard's sketch (work ∝ shard), reloaded
    and merged -- identical table to one-shot sketching (the same
    ingest-loop contract as the MinHash and Bloom indexes)."""
    df = _df(spark)
    old = df.where(F.col("shard") != 3)
    new = df.where(F.col("shard") == 3)
    stage = str(tmp_path_factory.mktemp("sk_idx"))
    SK.top_k_shard_sketches(old, "tok", "shard", max_tracked=100) \
        .write.mode("overwrite").parquet(stage)
    SK.top_k_shard_sketches(new, "tok", "shard", max_tracked=100) \
        .write.mode("append").parquet(stage)
    merged = {(r["item"], r["cnt"]) for r in
              SK.top_k_merge(spark.read.parquet(stage), k=100,
                             max_tracked=100).collect()}
    one = {(r["item"], r["cnt"]) for r in
           SK.top_k_items(df, "tok", k=100, max_tracked=100).collect()}
    assert merged == one


def test_kll_shard_merge_within_envelope(spark, tmp_path_factory):
    """Shard KLL sketches survive a parquet roundtrip and merge into
    quantiles within the one-shot sketch's rank envelope."""
    df = _df(spark)
    n = df.count()
    stage = str(tmp_path_factory.mktemp("kll_idx"))
    SK.kll_shard_sketches(df, "v", "shard", k=200) \
        .write.mode("overwrite").parquet(stage)
    merged = SK.kll_merge_quantiles(spark.read.parquet(stage),
                                    [0.25, 0.5, 0.9])
    for r in merged.collect():
        rank = df.where(F.col("v") <= r["value"]).count() / n
        assert abs(rank - r["prob"]) <= 0.05, (r, rank)


def test_kll_merge_quantiles_empty_shards(spark):
    """Zero shards degrade to NULL quantile values -- under ANSI mode
    (the driver-parity verify mode) the unguarded element_at(_l, 1) on
    the empty collect_list array threw INVALID_ARRAY_INDEX."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        empty = _df(spark).where(F.lit(False)) \
            .groupBy("shard").agg(F.expr(
                "kll_sketch_agg_double(CAST(v AS double), 200)")
                .alias("sketch"))
        rows = SK.kll_merge_quantiles(empty, [0.25, 0.5]).collect()
        assert [r["prob"] for r in rows] == [0.25, 0.5]
        assert all(r["value"] is None for r in rows)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_dataset_profile_exact_regime_and_partitioning(spark):
    """dataset_profile: exact-regime values match hand computation and
    are invariant to input partitioning; planted dups move dup_rate."""
    from bodo_spark.operators.sketches import dataset_profile

    rows = []
    for i in range(40):
        rows.append((i, "a" if i < 25 else "b", "en" if i % 3 else "de",
                     "tok " * (i % 7 + 1) + f"doc{i}"))
    rows.append((100, "a", "en", rows[0][3]))      # exact dup in 'a'
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string")
    out = {r.source: r for r in dataset_profile(df, kll_k=512).collect()}
    out2 = {r.source: r
            for r in dataset_profile(df.repartition(13), kll_k=512)
            .collect()}
    for s in ("a", "b"):
        assert tuple(out[s]) == tuple(out2[s])
    a = out["a"]
    assert a.n_docs == 26 and a.ndv_text == 25
    assert abs(a.dup_rate - round(1 - 25 / 26, 6)) < 1e-9
    assert a.n_langs == 2
    lens = sorted((i % 7 + 1) + 1 for i in range(25)) + [2]
    lens.sort()
    import math
    assert a.len_p50 == lens[max(1, math.ceil(0.5 * len(lens))) - 1]
    assert a.len_p90 == lens[max(1, math.ceil(0.9 * len(lens))) - 1]
