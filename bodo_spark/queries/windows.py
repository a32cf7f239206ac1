"""Window-function battery (SURVEY.md 2.5).

Covers the reference's window set (reference bodo/libs/window/
_window_compute.cpp:950-1490, streaming/_window.cpp): rank family,
lead/lag, first/last/nth, running and sliding frames, range frames,
ratio_to_report, conditional_change_event, and the QUALIFY
min-row-number-filter pattern. All windows order by a unique key chain
so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import QueryDef, bint, dec, fmt_date, tbl


def win_rank_orders(spark: SparkSession, sf: str) -> DataFrame:
    """rank / dense_rank / row_number per customer over order value."""
    o = tbl(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        bint(F.rank().over(w)).alias("rnk"),
        bint(F.dense_rank().over(w)).alias("drnk"),
        bint(F.row_number().over(w)).alias("rn"))
        .where(F.col("rn") <= 3))


_WIN_RANK_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) t WHERE rn <= 3
"""


def win_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative sum per user (reference MPI_Exscan cumulatives,
    bodo/libs/groupby/_groupby_mpi_exscan.cpp -> plain window here)."""
    e = tbl(spark, sf, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return e.select(
        "event_id", "user_id",
        F.sum(dec("value", 12)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"))


_WIN_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_value,
       COUNT(*) OVER w AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def win_lead_lag(spark: SparkSession, sf: str) -> DataFrame:
    """lead/lag with default values (reference bodo/libs/_lead_lag.cpp)."""
    e = tbl(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        (dec("value", 12) - dec(F.lag("value", 1).over(w), 12))
        .cast("double").alias("delta"))


_WIN_LEADLAG_SQL = """
SELECT event_id, user_id, value,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       lag(value, 2, -1.0) OVER w AS prev2_value,
       CAST(CAST(value AS DECIMAL(12,2))
            - CAST(lag(value, 1) OVER w AS DECIMAL(12,2)) AS DOUBLE) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def win_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding rows frame: 4-row moving average (reference rolling,
    bodo/hiframes/rolling.py:28)."""
    e = tbl(spark, sf, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, W.currentRow))
    return e.select(
        "event_id",
        (F.sum(dec("value", 12)).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("mavg"),
        F.min("value").over(w).alias("mmin"),
        F.max("value").over(w).alias("mmax"))


_WIN_MAVG_SQL = """
SELECT event_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS mavg,
       MIN(value) OVER w AS mmin,
       MAX(value) OVER w AS mmax
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def win_ntile_dist(spark: SparkSession, sf: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a unique ordering."""
    s = tbl(spark, sf, "supplier")
    w = W.orderBy(F.col("s_acctbal"), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_acctbal",
        bint(F.ntile(4).over(w)).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"))


_WIN_NTILE_SQL = """
SELECT s_suppkey, s_acctbal,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cdist
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
"""


def win_first_last_nth(spark: SparkSession, sf: str) -> DataFrame:
    """first/last/nth value over the full partition frame."""
    e = tbl(spark, sf, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (e.select(
        "user_id",
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
        F.nth_value("value", 2).over(w).alias("second_value"))
        .distinct())


_WIN_FLN_SQL = """
SELECT DISTINCT user_id,
       first_value(value) OVER w AS first_value,
       last_value(value) OVER w AS last_value,
       nth_value(value, 2) OVER w AS second_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def win_qualify_latest_order(spark: SparkSession, sf: str) -> DataFrame:
    """QUALIFY row_number()=1 (latest order per customer) -- the
    min-row-number-filter op (reference MinRowNumberFilterRule;
    Spark 3.5+ rewrites this to InferWindowGroupLimit, no full sort)."""
    o = tbl(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey",
                    fmt_date("o_orderdate").alias("latest_date")))


_WIN_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def win_ratio_to_report(spark: SparkSession, sf: str) -> DataFrame:
    """ratio_to_report (reference WindowAggregateFuncTable.kt) =
    x / sum(x) over partition."""
    e = tbl(spark, sf, "events")
    w = W.partitionBy("event_type")
    return e.select(
        "event_id", "event_type",
        (dec("value", 12).cast("double")
         / F.sum(dec("value", 12)).over(w).cast("double")).alias("ratio"))


_WIN_RATIO_SQL = """
SELECT event_id, event_type,
       CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)
       / CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY event_type) AS DOUBLE)
       AS ratio
FROM events
"""


def win_change_event(spark: SparkSession, sf: str) -> DataFrame:
    """conditional_change_event (reference window kernel): running count
    of event_type changes per user."""
    e = tbl(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    changed = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") == F.lag("event_type").over(w)), 0).otherwise(1)
    return (e.select("event_id", "user_id",
                     F.sum(changed).over(wcum).alias("change_seq")))


_WIN_CHANGE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS change_seq
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type = lag(event_type) OVER w THEN 0 ELSE 1 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) t
"""


def win_true_event(spark: SparkSession, sf: str) -> DataFrame:
    """conditional_true_event (reference window kernel
    _window_compute.cpp dispatch): running count of rows where a
    condition holds, per user ordered by time -- sum of the condition
    over an unbounded-preceding frame."""
    e = tbl(spark, sf, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return e.select(
        "event_id", "user_id",
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).over(w)
        .cast("long").alias("true_seq"))


_WIN_TRUE_EVENT_SQL = """
SELECT event_id, user_id,
       SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS true_seq
FROM events
"""


def win_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame on a numeric ordering: peers within 100.0 of current
    order value (reference Bounds.kt range frames). PySpark's
    Window.rangeBetween only accepts integer offsets, so the fractional
    frame goes through the SQL surface."""
    tbl(spark, sf, "orders").createOrReplaceTempView("_wrf_orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
               AS peers_within_100
        FROM _wrf_orders
    """)


_WIN_RANGE_SQL = """
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
       AS peers_within_100
FROM orders
"""


def win_qualify_sql_dialect(spark: SparkSession, sf: str) -> DataFrame:
    """QUALIFY through the engine's SQL context (desugared -- Spark has
    no QUALIFY clause; DuckDB runs the same text natively as oracle)."""
    from ..sql import BodoSQLContext
    bc = BodoSQLContext({"orders_q": tbl(spark, sf, "orders")}, spark=spark)
    return bc.sql("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders_q
        QUALIFY rank() OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """).spark


_WIN_QUALIFY_DIALECT_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY rank() OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey) <= 3
"""


def win_rolling_stats(spark: SparkSession, sf: str) -> DataFrame:
    """df.rolling median/cov/corr through the pandas-flavored frontend
    (reference bodo/hiframes/rolling.py:28,85): 5-row windows per order
    status; results null until the window is full, pandas-style."""
    from ..frame import BodoDataFrame

    orders = tbl(spark, sf, "orders").where(F.col("o_orderkey") < 3000)
    bdf = BodoDataFrame(orders)
    roll = bdf.rolling(5, order_by="o_orderkey",
                       partition_by="o_orderstatus")
    med = roll.median("o_totalprice")._df.select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice_roll_median", 4).alias("roll_median"))
    # cov is checked in the pandas differential suite instead: its raw
    # magnitude (~1e7) exposes 1e-9 co-moment-order float drift between
    # engines that no fixed rounding removes; corr is scale-free.
    cr = roll.corr("o_totalprice", "o_custkey")._df.select(
        "o_orderkey",
        F.round("o_totalprice_o_custkey_roll_corr", 4).alias("roll_corr"))
    return (med.join(cr, "o_orderkey")
            .orderBy("o_orderkey"))


_WIN_ROLLING_SQL = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey < 3000)
SELECT o_orderkey, o_orderstatus,
  CASE WHEN COUNT(*) OVER w >= 5
       THEN round(median(o_totalprice) OVER w, 4) END AS roll_median,
  CASE WHEN COUNT(*) OVER w >= 5
       THEN round(corr(o_totalprice, o_custkey) OVER w, 4) END AS roll_corr
FROM o
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def win_frontend_ops(spark: SparkSession, sf: str) -> DataFrame:
    """The pandas-frontend window surface under the gate: groupby
    transform (window-broadcast mean), Series.shift and Series.rank,
    all built through BodoDataFrame/BodoSeries (frame.py)."""
    from ..frame import BodoDataFrame

    orders = tbl(spark, sf, "orders").where(F.col("o_orderkey") < 3000)
    bdf = BodoDataFrame(orders)
    t = bdf.groupby("o_orderstatus").transform("o_totalprice", "mean")
    t = t.assign(
        prev_price=bdf["o_totalprice"].shift(1, order_by="o_orderkey"),
        price_rank=bdf["o_totalprice"].rank(method="min"))
    return (t.spark.select(
        "o_orderkey",
        F.round("o_totalprice_mean", 4).alias("status_mean"),
        F.round("prev_price", 2).alias("prev_price"),
        F.col("price_rank").cast("bigint").alias("price_rank"))
        .orderBy("o_orderkey"))


_WIN_FRONTEND_SQL = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey < 3000)
SELECT o_orderkey,
       round(avg(o_totalprice) OVER (PARTITION BY o_orderstatus), 4)
         AS status_mean,
       round(lag(o_totalprice, 1) OVER (ORDER BY o_orderkey), 2)
         AS prev_price,
       rank() OVER (ORDER BY o_totalprice) AS price_rank
FROM o ORDER BY o_orderkey
"""


def win_extended_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's extended windowed-aggregate set (reference
    window_agg_array_kernels.py windowed_bitor_agg/bitand/bitxor/
    count_if/skew and lead_lag.py null_ignoring_shift): bit aggregates
    and COUNT_IF over a sliding frame, null-ignoring lag/lead (Spark
    form: last/first with ignorenulls over one-sided frames), and
    windowed skewness from exact decimal moment sums (the same
    engine-portable derivation as agg_skew_kurt_moments)."""
    e = tbl(spark, sf, "events").where(F.col("event_id") < 3000)
    w = (W.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(-4, 0))
    wpast = (W.partitionBy("user_id").orderBy("event_id")
             .rowsBetween(W.unboundedPreceding, -1))
    wfut = (W.partitionBy("user_id").orderBy("event_id")
            .rowsBetween(1, W.unboundedFollowing))
    x = dec("value", 12)
    nv = F.when(F.col("event_id") % 3 == 0, F.col("value"))
    n = F.count("value").over(w)
    s1 = F.sum(x).over(w).cast("double")
    s2 = F.sum((x * x).cast("decimal(30,4)")).over(w).cast("double")
    s3 = F.sum((x * x * x).cast("decimal(38,6)")).over(w).cast("double")
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * s2 / n + 2 * m * m * m
    return e.select(
        "event_id",
        F.bit_or((F.col("event_id") % 255).cast("int")).over(w).alias("bor"),
        F.bit_and((F.col("event_id") % 255).cast("int")).over(w).alias("band"),
        F.bit_xor((F.col("event_id") % 255).cast("int")).over(w).alias("bxor"),
        F.count_if(F.col("value") > 50).over(w).alias("cif"),
        # windowed LISTAGG (reference windowed_object_agg family):
        # frame-ordered collect_list is deterministic
        F.array_join(F.collect_list(F.col("event_id") % 97).over(w), ",")
         .alias("lagg"),
        F.round(F.last(nv, ignorenulls=True).over(wpast), 2).alias("lag_nn"),
        F.round(F.first(nv, ignorenulls=True).over(wfut), 2).alias("lead_nn"),
        F.when((n == 5) & (m2 > 0), F.round(m3 / F.pow(m2, 1.5), 6))
         .alias("skw"),
    ).orderBy("event_id")


_WIN_EXTENDED_SQL = """
WITH t AS (SELECT * FROM events WHERE event_id < 3000),
s AS (
  SELECT event_id,
    bit_or(CAST(event_id % 255 AS INT)) OVER w AS bor,
    bit_and(CAST(event_id % 255 AS INT)) OVER w AS band,
    bit_xor(CAST(event_id % 255 AS INT)) OVER w AS bxor,
    count(CASE WHEN value > 50 THEN 1 END) OVER w AS cif,
    string_agg(CAST(event_id % 97 AS VARCHAR), ',') OVER w AS lagg,
    round(lag(CASE WHEN event_id % 3 = 0 THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY event_id), 2) AS lag_nn,
    round(lead(CASE WHEN event_id % 3 = 0 THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY event_id), 2) AS lead_nn,
    count(value) OVER w AS n,
    CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS s1,
    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                  AS DECIMAL(30,4))) OVER w AS DOUBLE) AS s2,
    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                  * CAST(value AS DECIMAL(12,2))
                  AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s3
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
SELECT event_id, bor, band, bxor, cif, lagg, lag_nn, lead_nn,
  CASE WHEN n = 5 AND s2/n - (s1/n)*(s1/n) > 0
       THEN round((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)*(s1/n)*(s1/n))
                  / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) END AS skw
FROM s ORDER BY event_id
"""


QUERIES: dict[str, QueryDef] = {
    "win_extended_aggs": QueryDef(win_extended_aggs, _WIN_EXTENDED_SQL),
    "win_frontend_ops": QueryDef(win_frontend_ops, _WIN_FRONTEND_SQL),
    "win_rolling_stats": QueryDef(win_rolling_stats, _WIN_ROLLING_SQL),
    "win_qualify_sql_dialect": QueryDef(win_qualify_sql_dialect,
                                        _WIN_QUALIFY_DIALECT_SQL),
    "win_rank_orders": QueryDef(win_rank_orders, _WIN_RANK_SQL),
    "win_running_sum": QueryDef(win_running_sum, _WIN_RUNNING_SQL),
    "win_lead_lag": QueryDef(win_lead_lag, _WIN_LEADLAG_SQL),
    "win_moving_avg": QueryDef(win_moving_avg, _WIN_MAVG_SQL),
    "win_ntile_dist": QueryDef(win_ntile_dist, _WIN_NTILE_SQL),
    "win_first_last_nth": QueryDef(win_first_last_nth, _WIN_FLN_SQL),
    "win_qualify_latest_order": QueryDef(win_qualify_latest_order, _WIN_QUALIFY_SQL),
    "win_ratio_to_report": QueryDef(win_ratio_to_report, _WIN_RATIO_SQL),
    "win_change_event": QueryDef(win_change_event, _WIN_CHANGE_SQL),
    "win_true_event": QueryDef(win_true_event, _WIN_TRUE_EVENT_SQL),
    "win_range_frame": QueryDef(win_range_frame, _WIN_RANGE_SQL),
}
