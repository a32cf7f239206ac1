"""Sketch-profiling battery (operators/sketches.py): heavy hitters,
theta/HLL distinct counts, KLL quantiles. The gates run every sketch in
its EXACT regime (state not saturated), so frequency/NDV outputs
hash-match DuckDB's exact groupBy/distinct; the one inherently
approximate surface (KLL quantile values after compaction) is pinned
with the engine-checked-invariant pattern agg_approx_ndv established:
the exact quantile is hash-compared for real and the sketch's value is
asserted inside its published rank-error envelope as a deterministic
boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as SK
from ._util import QueryDef, tbl

_SQL_TOKENS = "unnest(regexp_split_to_array(trim(text), '\\s+'))"


def sketch_token_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token frequency table computed ENTIRELY through the
    approx_top_k sketch (k = maxItemsTracked = 4096 >> vocabulary, the
    exact regime): every tracked item with its exact count must equal
    DuckDB's explode+groupBy. Tie-independent by construction -- ALL
    items are emitted, so no arbitrary top-k boundary exists."""
    d = tbl(spark, sf, "documents")
    toks = d.select("source", F.explode(
        F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    out = SK.top_k_items(toks, "tok", k=4096, max_tracked=4096,
                         by=["source"])
    return (out.select("source", F.col("item").alias("tok"),
                       F.col("cnt").cast("bigint").alias("cnt"))
            .orderBy("source", "tok"))


_TOKEN_FREQ_SQL = f"""
SELECT source, tok, COUNT(*) AS cnt
FROM (SELECT source, {_SQL_TOKENS} AS tok FROM documents)
GROUP BY source, tok ORDER BY source, tok
"""


def sketch_ndv_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-token profile: per-source theta-sketch NDV plus the
    corpus-wide NDV from UNIONING the per-source sketches (the
    shard-sketch-then-merge pattern -- row data never reshuffled, only
    KB-sized sketch states). Exact below the 2^12 nominal-entries
    budget, so both hash-match exact COUNT(DISTINCT). An HLL estimate
    rides along under the 5%-envelope invariant flag."""
    d = tbl(spark, sf, "documents")
    toks = d.select("source", F.explode(
        F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    per_src = (SK.theta_ndv(toks, "tok", by=["source"])
               .join(SK.hll_ndv(toks, "tok", by=["source"]), "source"))
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("_exact"))
    per_src = (per_src.join(exact, "source")
               .select("source", "ndv",
                       (F.abs(F.col("ndv_est") - F.col("_exact"))
                        / F.col("_exact") <= 0.05).alias("hll_ok")))
    union = (SK.theta_union_ndv(toks, "tok", "source")
             .select(F.lit("__all__").alias("source"), "ndv",
                     F.lit(True).alias("hll_ok")))
    return per_src.unionByName(union).orderBy("source")


_NDV_PROFILE_SQL = f"""
WITH toks AS (SELECT source, {_SQL_TOKENS} AS tok FROM documents)
SELECT source, COUNT(DISTINCT tok) AS ndv, TRUE AS hll_ok
FROM toks GROUP BY source
UNION ALL
SELECT '__all__' AS source, COUNT(DISTINCT tok) AS ndv, TRUE AS hll_ok
FROM toks
ORDER BY source
"""


_PROBS = [0.25, 0.5, 0.75, 0.9]


def sketch_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """KLL streaming quantiles over l_quantity next to the exact
    percentile: the exact value is hash-compared against DuckDB's
    quantile_cont (both engines interpolate R-7), while the KLL value is
    asserted within a generous rank envelope (k=200 => ~1.65% normalized
    rank error; +2% value-mass granularity of the integer domain;
    envelope 0.06) -- a deterministic TRUE regardless of compaction
    randomness."""
    li = tbl(spark, sf, "lineitem")
    kll = SK.kll_quantiles(li, "l_quantity", _PROBS, k=200)
    n = li.count()
    ranks = (li.crossJoin(F.broadcast(kll))
             .groupBy("prob", "value")
             .agg((F.sum((F.col("l_quantity") <= F.col("value"))
                         .cast("long")) / F.lit(float(n))).alias("_rnk")))
    exact = li.agg(*[
        F.round(F.expr(f"percentile(l_quantity, {p})"), 6)
        .alias(f"_q{int(p * 100)}") for p in _PROBS])
    exact_rows = exact.select(F.explode(F.array(*[
        F.struct(F.lit(float(p)).alias("prob"),
                 F.col(f"_q{int(p * 100)}").alias("exact_q"))
        for p in _PROBS])).alias("_e")).select("_e.prob", "_e.exact_q")
    return (ranks.join(exact_rows, "prob")
            .select("prob", "exact_q",
                    ((F.col("_rnk") >= F.col("prob") - 0.06)
                     & (F.col("_rnk") <= F.col("prob") + 0.06))
                    .alias("kll_rank_ok"))
            .orderBy("prob"))


# DuckDB's quantile_cont requires a CONSTANT prob -> one SELECT per prob
_QUANTILES_SQL = "\nUNION ALL\n".join(
    f"SELECT {p} AS prob, round(quantile_cont(l_quantity, {p}), 6) "
    f"AS exact_q, TRUE AS kll_rank_ok FROM lineitem"
    for p in _PROBS) + "\nORDER BY prob"


QUERIES: dict[str, QueryDef] = {
    "sketch_token_freq": QueryDef(sketch_token_freq, _TOKEN_FREQ_SQL),
    "sketch_ndv_profile": QueryDef(sketch_ndv_profile, _NDV_PROFILE_SQL),
    "sketch_quantiles": QueryDef(sketch_quantiles, _QUANTILES_SQL),
}
