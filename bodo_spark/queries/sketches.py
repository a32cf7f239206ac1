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


def sketch_dataset_profile(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass per-source data card (operators/sketches.py
    dataset_profile): doc count, token mass, duplicate rate (theta NDV
    over text fingerprints -- planted exact dups of every 9th doc make
    it non-vacuous), language NDV, and KLL p50/p90 token lengths, all
    from ONE groupBy whose exchange carries sketch states. Exact
    regime (kll_k >= group size, NDV << 2^12), so the oracle pins
    every value exactly."""
    d = tbl(spark, sf, "documents").select("doc_id", "source", "lang",
                                           "text")
    dups = (d.where(F.col("doc_id") % 9 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    corpus = d.unionByName(dups)
    return (SK.dataset_profile(corpus, by="source", kll_k=8192)
            .select("source", "n_docs", "tok_mass", "ndv_text",
                    "dup_rate", "n_langs", "len_p50", "len_p90")
            .orderBy("source"))


_PROFILE_SQL = """
WITH corpus AS (
  SELECT source, lang, text FROM documents
  UNION ALL
  SELECT source, lang, text FROM documents WHERE doc_id % 9 = 0),
base AS (
  SELECT source, lang, md5(text) AS fp,
         len(regexp_split_to_array(trim(text), '\\s+')) AS nt
  FROM corpus),
g AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS tok_mass,
         COUNT(DISTINCT fp) AS ndv_text,
         COUNT(DISTINCT lang) AS n_langs
  FROM base GROUP BY source),
r AS (
  SELECT source, nt,
         row_number() OVER (PARTITION BY source ORDER BY nt) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM base),
q AS (
  SELECT source,
         MAX(CASE WHEN rn = greatest(CAST(ceil(0.5 * cnt) AS BIGINT), 1)
                  THEN nt END) AS len_p50,
         MAX(CASE WHEN rn = greatest(CAST(ceil(0.9 * cnt) AS BIGINT), 1)
                  THEN nt END) AS len_p90
  FROM r GROUP BY source)
SELECT g.source, g.n_docs, g.tok_mass, g.ndv_text,
       round(1.0 - g.ndv_text / g.n_docs, 6) AS dup_rate,
       g.n_langs, q.len_p50, q.len_p90
FROM g JOIN q ON g.source = q.source
ORDER BY g.source
"""


QUERIES: dict[str, QueryDef] = {
    "sketch_dataset_profile": QueryDef(sketch_dataset_profile,
                                       _PROFILE_SQL),
    "sketch_token_freq": QueryDef(sketch_token_freq, _TOKEN_FREQ_SQL),
    "sketch_ndv_profile": QueryDef(sketch_ndv_profile, _NDV_PROFILE_SQL),
    "sketch_quantiles": QueryDef(sketch_quantiles, _QUANTILES_SQL),
}
