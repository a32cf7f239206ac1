"""Pandas general-function battery (reference docs
api_docs/pandas/general_functions/): pd.cut / pd.qcut / pd.crosstab /
pd.to_numeric through the bodo_spark frontend, DuckDB-oracled.

cut/qcut assignment is a literal CASE expression (no UDF, no extra
shuffle); qcut's edges come from one exact-percentile aggregate job.
crosstab is groupBy().pivot().count() -- Spark discovers the pivoted
column set exactly like pandas does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, tbl

_CUT_EDGES = [0.0, 100000.0, 200000.0, 300000.0, 600000.0]


def pd_cut_qcut(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width cut codes x quantile qcut codes over order totals,
    plus a to_numeric(coerce) hit-count, grouped -- exercises the whole
    binning path end to end."""
    from ..frame import BodoDataFrame, cut, qcut, to_numeric

    orders = tbl(spark, sf, "orders")
    bdf = BodoDataFrame(orders)
    price = bdf["o_totalprice"]
    # numeric-looking strings on 1/3 of rows, garbage on the rest
    dirty = price.astype("string").where(bdf["o_orderkey"] % 3 == 0,
                                         other="N/A")
    out = bdf.assign(
        cut_code=cut(price, _CUT_EDGES, labels=False),
        qcut_code=qcut(price, 4, labels=False),
        as_num=to_numeric(dirty, errors="coerce"),
    )
    return (out.spark.groupBy("cut_code", "qcut_code")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("as_num").alias("n_numeric"))
            .orderBy("cut_code", "qcut_code"))


_CUT_QCUT_SQL = """
WITH e AS (
  SELECT quantile_cont(o_totalprice, [0.0, 0.25, 0.5, 0.75, 1.0]) AS ed
  FROM orders)
SELECT
  CASE WHEN o_totalprice > 0 AND o_totalprice <= 100000 THEN 0
       WHEN o_totalprice > 100000 AND o_totalprice <= 200000 THEN 1
       WHEN o_totalprice > 200000 AND o_totalprice <= 300000 THEN 2
       WHEN o_totalprice > 300000 AND o_totalprice <= 600000 THEN 3
  END AS cut_code,
  CASE WHEN o_totalprice <= ed[2] THEN 0
       WHEN o_totalprice <= ed[3] THEN 1
       WHEN o_totalprice <= ed[4] THEN 2
       WHEN o_totalprice <= ed[5] THEN 3
  END AS qcut_code,
  COUNT(*) AS n,
  COUNT(TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                       THEN CAST(o_totalprice AS VARCHAR)
                       ELSE 'N/A' END AS DOUBLE)) AS n_numeric
FROM orders, e
GROUP BY 1, 2 ORDER BY cut_code, qcut_code
"""


def pd_crosstab(spark: SparkSession, sf: str) -> DataFrame:
    """pd.crosstab(status, priority): groupBy + pivot + count with
    zero-fill; the pivoted column names are the discovered distinct
    priorities, same as pandas' column discovery."""
    from ..frame import BodoDataFrame, crosstab

    orders = tbl(spark, sf, "orders")
    bdf = BodoDataFrame(orders)
    return crosstab(bdf["o_orderstatus"], bdf["o_orderpriority"]).spark


_CROSSTAB_SQL = """
SELECT o_orderstatus,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
         AS "1-URGENT",
       COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
         AS "3-MEDIUM",
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
         AS "4-NOT SPECIFIED",
       COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def pd_fill_cum_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Series ffill/bfill (null gap filling), cummax and diff through
    the frontend -- all single-window JVM expressions, partitioned by
    user (the scale path)."""
    from ..frame import BodoDataFrame

    e = tbl(spark, sf, "events").where(F.col("event_id") < 3000)
    bdf = BodoDataFrame(
        e.withColumn("h", F.when(F.col("event_id") % 5 != 0,
                                 F.col("value"))))
    out = bdf.assign(
        ff=bdf["h"].ffill(order_by="event_id", partition_by="user_id"),
        bf=bdf["h"].bfill(order_by="event_id", partition_by="user_id"),
        cmx=bdf["value"].cummax(order_by="event_id"),
        d=bdf["value"].diff(order_by="event_id",
                            partition_by="user_id"),
    )
    return (out.spark.select(
        "event_id",
        F.round("ff", 2).alias("ff"), F.round("bf", 2).alias("bf"),
        F.round("cmx", 2).alias("cmx"), F.round("d", 2).alias("d"))
        .orderBy("event_id"))


_FILL_CUM_SQL = """
SELECT event_id,
  round(last_value(CASE WHEN event_id % 5 != 0 THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY event_id
              ROWS UNBOUNDED PRECEDING), 2) AS ff,
  round(first_value(CASE WHEN event_id % 5 != 0 THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS bf,
  round(max(value) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING), 2)
    AS cmx,
  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
    AS d
FROM events WHERE event_id < 3000 ORDER BY event_id
"""


def pd_group_cum_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Group cumulatives (cumprod/cummax/cummin -- the reference's
    remaining groupby ftypes) and groupby.shift through the frontend,
    all single-window prefix aggregates."""
    from ..frame import BodoDataFrame

    e = tbl(spark, sf, "events").where(F.col("event_id") < 3000)
    bdf = BodoDataFrame(e.withColumn(
        "r", (F.col("event_id") % 7).cast("double") / 10 + 1))
    gb = bdf.groupby("user_id")
    out = gb.cumprod("r", order_by="event_id")
    out = BodoDataFrame(out.spark)
    out = BodoDataFrame(BodoDataFrame(out.spark).groupby("user_id")
                        .cummax("value", order_by="event_id").spark)
    out = BodoDataFrame(out.groupby("user_id")
                        .shift("value", 1, order_by="event_id").spark)
    return (out.spark.select(
        "event_id",
        F.round("r_cumprod", 6).alias("cp"),
        F.round("value_cummax", 2).alias("cmx"),
        F.round("value_shift", 2).alias("prev"))
        .orderBy("event_id"))


_GROUP_CUM_SQL = """
SELECT event_id,
  round(product(CAST(event_id % 7 AS DOUBLE) / 10 + 1)
        OVER (PARTITION BY user_id ORDER BY event_id
              ROWS UNBOUNDED PRECEDING), 6) AS cp,
  round(max(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS UNBOUNDED PRECEDING), 2) AS cmx,
  round(lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
    AS prev
FROM events WHERE event_id < 3000 ORDER BY event_id
"""


def pd_udf_surfaces(spark: SparkSession, sf: str) -> DataFrame:
    """All three Python-UDF surfaces chained in ONE plan under the gate
    (reference frame.py:1410 df.apply(axis=1), series.py:857
    map_partitions, groupby.py:159 groupby.apply): row-wise apply
    derives a priority code, an Arrow-batched map_partitions adds
    doubled-price and name-length columns in pandas space, and
    groupby.apply aggregates each group inside a pandas UDF. Every
    computed value is deterministic (count / int sum / max -- no
    float-accumulation order sensitivity), so the oracle restates the
    whole chain in plain SQL: a hash match proves the Arrow
    serialization boundary round-trips values exactly."""
    from ..frame import BodoDataFrame

    o = tbl(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"))
    bdf = BodoDataFrame(o)
    # surface 1: row-wise apply (pandas_udf over a struct of all cols)
    coded = bdf.apply(lambda r: r["o_orderpriority"][:1],
                      return_type="string", result_name="prio_code")
    # surface 2: mapInPandas batch transform (x2 is exact in binary fp)
    mapped = coded.map_partitions(
        lambda pdf: pdf.assign(
            price2=pdf["price"] * 2,
            prio_len=pdf["o_orderpriority"].str.len().astype("int64")),
        schema="o_orderkey bigint, o_orderpriority string, price double, "
               "prio_code string, price2 double, prio_len bigint")

    # surface 3: groupby.apply (applyInPandas per group)
    def per_group(pdf):
        import pandas as pd
        return pd.DataFrame({
            "prio_code": [pdf["prio_code"].iloc[0]],
            "n_rows": [len(pdf)],
            "sum_prio_len": [int(pdf["prio_len"].sum())],
            "max_price2": [float(pdf["price2"].max())]})

    out = mapped.groupby("prio_code").apply(
        per_group,
        schema="prio_code string, n_rows bigint, sum_prio_len bigint, "
               "max_price2 double")
    return out.spark.orderBy("prio_code")


_UDF_SURFACES_SQL = """
SELECT substr(o_orderpriority, 1, 1) AS prio_code,
       COUNT(*) AS n_rows,
       CAST(SUM(length(o_orderpriority)) AS BIGINT) AS sum_prio_len,
       MAX(CAST(o_totalprice AS DOUBLE) * 2) AS max_price2
FROM orders GROUP BY 1 ORDER BY 1
"""


def pd_stateful_map(spark: SparkSession, sf: str) -> DataFrame:
    """map_partitions_with_state under the gate (reference
    series.py:857 map_with_state): per-partition init builds a compiled
    regex ONCE (the expensive-setup pattern -- model handle, client,
    compiled automaton) and every Arrow batch reuses it. Vowel counts
    per document, aggregated per language; the oracle restates the
    regex count in SQL, so a hash match proves the stateful path
    computed real values, not just ran."""
    from ..frame import BodoDataFrame

    d = tbl(spark, sf, "documents").select("doc_id", "lang", "text")

    def init_state():
        import re
        return re.compile(r"[aeiou]")

    def count_vowels(state, pdf):
        out = pdf[["doc_id", "lang"]].copy()
        out["n_vowels"] = pdf["text"].map(
            lambda s: len(state.findall(s))).astype("int64")
        return out

    out = BodoDataFrame(d).map_partitions_with_state(
        init_state, count_vowels,
        schema="doc_id bigint, lang string, n_vowels bigint")
    return (out.spark.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_vowels").cast("bigint").alias("sum_vowels"))
            .orderBy("lang"))


_STATEFUL_MAP_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[aeiou]'))) AS BIGINT)
         AS sum_vowels
FROM documents GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, QueryDef] = {
    "pd_cut_qcut": QueryDef(pd_cut_qcut, _CUT_QCUT_SQL),
    "pd_crosstab": QueryDef(pd_crosstab, _CROSSTAB_SQL),
    "pd_fill_cum_ops": QueryDef(pd_fill_cum_ops, _FILL_CUM_SQL),
    "pd_group_cum_ops": QueryDef(pd_group_cum_ops, _GROUP_CUM_SQL),
    "pd_udf_surfaces": QueryDef(pd_udf_surfaces, _UDF_SURFACES_SQL),
    "pd_stateful_map": QueryDef(pd_stateful_map, _STATEFUL_MAP_SQL),
}
