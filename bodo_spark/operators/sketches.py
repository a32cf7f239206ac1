"""Mergeable data-sketch profiling: heavy hitters, distinct counts,
quantiles -- the corpus-statistics pass a 100-TB pipeline runs ahead of
curation decisions (vocabulary heads for boilerplate thresholds, NDV
for join planning, token-length quantiles for packing capacity).

Spark 4 ships the Apache DataSketches family as SQL aggregates
(approx_top_k / theta_sketch_agg / kll_sketch_agg_* / hll_sketch_agg);
this module wraps them behind a typed API and -- the part that matters
at scale -- exposes the ACCUMULATE / COMBINE split: sketch each shard
independently (one narrow pass, a few-KB binary per shard), persist or
ship the sketches, and merge them centrally. Merges are commutative and
associative, so estimates are deterministic for fixed data regardless
of partitioning (verified in tests by re-sketching under different
repartitions).

Exactness envelope (what the oracle gates pin): every one of these
sketches is EXACT while its state has not saturated -- approx_top_k
below maxItemsTracked distinct items, theta below its nominal-entries
budget (default 2^12), KLL before compaction. The gates run in that
regime (hash-exact vs DuckDB's groupBy/quantile); beyond it the
estimates carry the library's published error bounds, which the KLL
gate additionally asserts as a rank-error invariant (the same
engine-checked-invariant pattern as agg_approx_ndv).

Reference parity: the reference implements theta sketches natively for
NDV (bodo/libs/_theta_sketches.cpp) and per-column quantile/frequency
profiling in its C++ groupby; here the JVM aggregate does the same job
with whole-stage codegen and no extra runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "top_k_items", "top_k_shard_sketches", "top_k_merge",
    "theta_ndv", "theta_union_ndv", "kll_quantiles",
    "kll_shard_sketches", "kll_merge_quantiles", "hll_ndv",
]


def top_k_items(df: DataFrame, col: str, *, k: int = 10,
                max_tracked: int = 4096,
                by: list[str] | None = None) -> DataFrame:
    """Top-``k`` most frequent values of ``col`` (optionally per ``by``
    group): one narrow aggregation pass, map-side combined, constant
    state per group. Exact while distinct(col) <= max_tracked; the
    DataSketches frequent-items guarantee beyond. Returns (by...,
    item, cnt) sorted within group by (cnt desc, item)."""
    keys = by or []
    tk = F.expr(f"approx_top_k({col}, {int(k)}, {int(max_tracked)})")
    out = (df.groupBy(*keys).agg(tk.alias("_tk"))
           .select(*keys, F.explode("_tk").alias("_e"))
           .select(*keys, F.col("_e.item").alias("item"),
                   F.col("_e.count").alias("cnt")))
    return out.orderBy(*keys, F.col("cnt").desc(), "item")


def top_k_shard_sketches(df: DataFrame, col: str, shard_col: str, *,
                         max_tracked: int = 4096) -> DataFrame:
    """Per-shard frequency sketch (binary state, a few KB each): the
    shippable artifact. Sketch shards on ingest, store next to the
    data, and answer corpus-wide top-k later without re-reading rows."""
    acc = F.expr(f"approx_top_k_accumulate({col}, {int(max_tracked)})")
    return df.groupBy(shard_col).agg(acc.alias("sketch"))


def top_k_merge(sketches: DataFrame, *, k: int = 10,
                max_tracked: int = 4096,
                sketch_col: str = "sketch") -> DataFrame:
    """Combine shard sketches into corpus-wide (item, cnt) top-k. The
    combine is one tiny aggregation over n_shards rows."""
    comb = F.expr(f"approx_top_k_combine({sketch_col}, {int(max_tracked)})")
    est = f"approx_top_k_estimate(_c, {int(k)})"
    return (sketches.agg(comb.alias("_c"))
            .select(F.explode(F.expr(est)).alias("_e"))
            .select(F.col("_e.item").alias("item"),
                    F.col("_e.count").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "item"))


def theta_ndv(df: DataFrame, col: str, *, by: list[str] | None = None,
              lg_k: int = 12) -> DataFrame:
    """Distinct-count via theta sketch (exact below ~2^lg_k distinct;
    mergeable across shards with theta unions). Returns (by..., ndv)."""
    keys = by or []
    e = F.expr(f"theta_sketch_estimate(theta_sketch_agg({col}, {int(lg_k)}))")
    out = df.groupBy(*keys).agg(e.cast("bigint").alias("ndv"))
    return out.orderBy(*keys) if keys else out


def theta_union_ndv(df: DataFrame, col: str, shard_col: str, *,
                    lg_k: int = 12) -> DataFrame:
    """Corpus-wide NDV from per-shard theta sketches: sketch each shard,
    union the (tiny) sketches -- the distributed-distinct pattern that
    never shuffles row data, only KB-sized sketch states."""
    sk = F.expr(f"theta_sketch_agg({col}, {int(lg_k)})")
    shards = df.groupBy(shard_col).agg(sk.alias("_s"))
    est = F.expr(f"theta_sketch_estimate(theta_union_agg(_s, {int(lg_k)}))")
    return shards.agg(est.cast("bigint").alias("ndv"))


def kll_quantiles(df: DataFrame, col: str, probs: list[float], *,
                  k: int = 200, dtype: str = "double") -> DataFrame:
    """Streaming quantiles via KLL (one pass, mergeable, ~k doubles of
    state; normalized rank error ~1.65%/sqrt(k/200)). Returns one row
    per prob: (prob, value). Spark bounds k to [8, 65535] -- which also
    bounds the exact-deterministic regime (n <= k) a hash-pinned gate
    can rely on; fail here with a clear message instead of deep in the
    analyzer."""
    if not 8 <= k <= 65535:
        raise ValueError(f"KLL k must be in [8, 65535], got {k}")
    sk = F.expr(f"kll_sketch_agg_{dtype}(CAST({col} AS {dtype}), {int(k)})")
    # ONE sketch build; all probs read from the same aggregated state
    # (a per-prob union of df.agg(...) frames would re-sketch the column
    # len(probs) times)
    qs = F.array(*[
        F.struct(F.lit(float(p)).alias("prob"),
                 F.expr(f"kll_sketch_get_quantile_{dtype}(_sk, "
                        f"CAST({float(p)} AS {dtype}))")
                 .cast("double").alias("value"))
        for p in probs])
    return (df.agg(sk.alias("_sk"))
            .select(F.explode(qs).alias("_q"))
            .select("_q.prob", "_q.value")
            .orderBy("prob"))


def kll_shard_sketches(df: DataFrame, col: str, shard_col: str, *,
                       k: int = 200, dtype: str = "double") -> DataFrame:
    """Per-shard KLL quantile sketch (binary, ~k values of state): the
    durable artifact for incremental quantile profiling -- sketch each
    ingest batch, store, merge later without re-reading rows."""
    sk = F.expr(f"kll_sketch_agg_{dtype}(CAST({col} AS {dtype}), {int(k)})")
    return df.groupBy(shard_col).agg(sk.alias("sketch"))


def kll_merge_quantiles(sketches: DataFrame, probs: list[float], *,
                        dtype: str = "double",
                        sketch_col: str = "sketch") -> DataFrame:
    """Merge shard KLL sketches and read quantiles from the combined
    state. ``kll_sketch_merge_*`` is a BINARY scalar (pairwise merge),
    so the shard states are collect_list-ed (n_shards rows -- tiny) and
    folded with the `aggregate` higher-order function; KLL merges are
    associative, so the fold order is immaterial to the guarantee.

    Zero shards (an empty ``sketches`` frame) yields one row per prob
    with NULL value -- without the size guard, element_at(_l, 1) on the
    empty collect_list array throws INVALID_ARRAY_INDEX under ANSI mode
    (the driver-parity verify mode) instead of degrading gracefully."""
    qs = F.array(*[
        F.struct(F.lit(float(p)).alias("prob"),
                 F.expr(f"kll_sketch_get_quantile_{dtype}(_sk, "
                        f"CAST({float(p)} AS {dtype}))")
                 .cast("double").alias("value"))
        for p in probs])
    fold = (f"CASE WHEN size(_l) = 0 THEN NULL ELSE "
            f"aggregate(slice(_l, 2, greatest(size(_l) - 1, 0)), "
            f"element_at(_l, 1), (a, x) -> kll_sketch_merge_{dtype}(a, x)) "
            f"END")
    return (sketches.agg(F.expr(f"collect_list({sketch_col})").alias("_l"))
            .select(F.expr(fold).alias("_sk"))
            .select(F.explode(qs).alias("_q"))
            .select("_q.prob", "_q.value")
            .orderBy("prob"))


def hll_ndv(df: DataFrame, col: str, *, by: list[str] | None = None,
            lg_k: int = 12) -> DataFrame:
    """Distinct-count via DataSketches HLL (mergeable with
    hll_union_agg; estimates deterministic for fixed data because slot
    merges are commutative max operations). Returns (by..., ndv_est)."""
    keys = by or []
    e = F.expr(f"hll_sketch_estimate(hll_sketch_agg({col}, {int(lg_k)}))")
    out = df.groupBy(*keys).agg(e.cast("bigint").alias("ndv_est"))
    return out.orderBy(*keys) if keys else out


def dataset_profile(df: DataFrame, *, by: str = "source",
                    text_col: str = "text",
                    lang_col: str | None = "lang",
                    lg_k: int = 12, kll_k: int = 200) -> DataFrame:
    """One-pass 'data card' per ``by`` group: the profile a training-
    data pipeline prints before anyone trains on the corpus --
    (group, n_docs, tok_mass, dup_rate, n_langs, len_p50, len_p90).

    Scale design: ONE groupBy over the corpus; every statistic is
    either an ordinary algebraic aggregate or a mergeable sketch state
    (theta for text-fingerprint NDV -> dup rate, theta for language
    NDV, KLL for the token-length distribution), so the exchange
    carries KB-sized states per group -- at 100 TB this is one scan.
    Exact regime (group NDV < 2^lg_k, group rows <= kll_k): every
    value equals its exact counterpart, which is what the gate oracle
    pins; production keeps the defaults and the published error
    envelopes.

    Text identity uses md5 under exact mode / xxhash64 otherwise
    (the repo's fingerprint convention, operators/text.py)."""
    from ..modes import exact_mode
    from .text import token_count

    fp = (F.md5(F.col(text_col)) if exact_mode()
          else F.xxhash64(F.col(text_col)).cast("string"))
    nt = token_count(text_col)
    # ONE kll state per group (both quantiles read from the same
    # aggregated sketch -- two agg-side get_quantile calls would carry
    # two identical states through the exchange)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).cast("bigint").alias("tok_mass"),
        F.expr(f"theta_sketch_estimate(theta_sketch_agg(_fp, "
               f"{int(lg_k)}))").alias("_ndv"),
        F.expr(f"kll_sketch_agg_double(CAST(_nt AS DOUBLE), "
               f"{int(kll_k)})").alias("_sk"),
    ]
    if lang_col is not None:
        aggs.insert(3, F.expr(
            f"theta_sketch_estimate(theta_sketch_agg({lang_col}, "
            f"{int(lg_k)}))").cast("bigint").alias("n_langs"))
    out = (df.withColumn("_fp", fp).withColumn("_nt", nt)
           .groupBy(by).agg(*aggs))
    q = "kll_sketch_get_quantile_double(_sk, CAST({p} AS double))"
    return (out
            .withColumn("len_p50",
                        F.expr(q.format(p=0.5)).cast("bigint"))
            .withColumn("len_p90",
                        F.expr(q.format(p=0.9)).cast("bigint"))
            .withColumn("dup_rate",
                        F.round(1.0 - F.col("_ndv") / F.col("n_docs"), 6))
            .withColumn("ndv_text", F.col("_ndv").cast("bigint"))
            .drop("_ndv", "_sk"))
