"""Datetime-function battery (SURVEY.md 2.8): the reference's datetime
kernel library (reference BodoSQL/bodosql/kernels/
datetime_array_kernels.py, 4370 LoC) via built-in Spark functions.

Cross-engine notes baked into the oracles:
  - Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday -> oracle +1.
  - Spark weekofyear == ISO week == DuckDB week.
  - next_day has no DuckDB builtin -> modular date arithmetic.
  - Outputs never expose raw timestamps (string-formatted instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, bint, dec, dsum, tbl


def dt_extract_parts(spark: SparkSession, sf: str) -> DataFrame:
    """get_* part extraction (reference get_* diff_* kernel families)."""
    o = tbl(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        bint(F.year("o_orderdate")).alias("yr"),
        bint(F.quarter("o_orderdate")).alias("qtr"),
        bint(F.month("o_orderdate")).alias("mo"),
        bint(F.dayofmonth("o_orderdate")).alias("dom"),
        bint(F.dayofyear("o_orderdate")).alias("doy"),
        bint(F.dayofweek("o_orderdate")).alias("dow_sun1"),
        bint(F.weekday("o_orderdate") + 1).alias("isodow"),
        bint(F.weekofyear("o_orderdate")).alias("isoweek"),
    )


_DT_PARTS_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(day FROM o_orderdate) AS dom,
       EXTRACT(dayofyear FROM o_orderdate) AS doy,
       EXTRACT(dayofweek FROM o_orderdate) + 1 AS dow_sun1,
       EXTRACT(isodow FROM o_orderdate) AS isodow,
       EXTRACT(week FROM o_orderdate) AS isoweek
FROM orders
"""


def dt_time_parts(spark: SparkSession, sf: str) -> DataFrame:
    """hour/minute/second/epoch on event timestamps."""
    e = tbl(spark, sf, "events")
    return e.select(
        "event_id",
        bint(F.hour("ts")).alias("hh"),
        bint(F.minute("ts")).alias("mi"),
        bint(F.second("ts")).alias("ss"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


_DT_TIME_SQL = """
SELECT event_id,
       EXTRACT(hour FROM ts) AS hh,
       EXTRACT(minute FROM ts) AS mi,
       EXTRACT(second FROM ts) AS ss,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM events
"""


def dt_trunc_monthly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """date_trunc rollup: monthly order revenue."""
    o = tbl(spark, sf, "orders")
    return (o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month"))
        .agg(dsum(dec("o_totalprice", 12)).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy("month"))


_DT_TRUNC_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY month
"""


def dt_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """date_add / add_months / datediff / last_day / next_day
    (reference add_interval_*, diff_*, last_day_*, next_day kernels)."""
    o = tbl(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    # next Monday strictly after d: d + (7 - (isodow - 1)) mod 7, 0 -> 7
    iso = F.weekday(d) + 1
    shift = (F.lit(8) - iso) % 7
    next_mon = F.date_add(d, F.when(shift == 0, 7).otherwise(shift))
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30d"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
        bint(F.datediff(F.lit("2002-01-01").cast("date"), d)).alias("days_to_2002"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.date_format(next_mon, "yyyy-MM-dd").alias("next_monday"),
    )


_DT_ARITH_SQL = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30d,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
       strftime(CAST(o_orderdate AS DATE)
                + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                            ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER),
                '%Y-%m-%d') AS next_monday
FROM orders
"""


def dt_format_patterns(spark: SparkSession, sf: str) -> DataFrame:
    """date_format / to_char patterns (reference date_format kernel)."""
    o = tbl(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso"),
        F.date_format("o_orderdate", "yyyy/MM").alias("ym"),
        F.date_format("o_orderdate", "EEEE").alias("dayname"),
        F.date_format("o_orderdate", "MMMM").alias("monthname"),
    )


_DT_FORMAT_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
       strftime(o_orderdate, '%Y/%m') AS ym,
       dayname(o_orderdate) AS dayname,
       monthname(o_orderdate) AS monthname
FROM orders
"""


def dt_from_unix_make_date(spark: SparkSession, sf: str) -> DataFrame:
    """from_unixtime / make_date / make_timestamp (reference
    construct_timestamp, date_from_parts kernels)."""
    e = tbl(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_format(
            F.timestamp_seconds(F.unix_timestamp("ts") + 3600),
            "yyyy-MM-dd HH:mm:ss").alias("plus1h"),
        F.date_format(
            F.make_date(F.lit(2024), F.month("ts"), F.dayofmonth("ts")),
            "yyyy-MM-dd").alias("made_date"),
    )


_DT_MAKE_SQL = """
SELECT event_id,
       strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) + 3600),
                '%Y-%m-%d %H:%M:%S') AS plus1h,
       strftime(make_date(2024, CAST(EXTRACT(month FROM ts) AS BIGINT),
                          CAST(EXTRACT(day FROM ts) AS BIGINT)),
                '%Y-%m-%d') AS made_date
FROM events
"""


def dt_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after a
    >30 min silence per user. The canonical large-scale clickstream
    pattern (window cumsum of gap flags -- one shuffle)."""
    from pyspark.sql import Window as W
    e = tbl(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts")
           - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    new_sess = F.when(gap | F.lag("ts").over(w).isNull(), 1).otherwise(0)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (e.withColumn("session_id", F.sum(new_sess).over(wcum)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.max("n_events").alias("max_session_events"))
            .orderBy("user_id"))


_DT_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS session_id
  FROM flagged),
per_sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


def dt_bucket_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style rollup: 6-hour buckets per event_type with
    EMPTY buckets materialized (operators/timebucket.py bucket_gapfill);
    spine generated per-group from its own range, no global calendar."""
    from ..operators.timebucket import bucket_gapfill

    e = tbl(spark, sf, "events")
    out = bucket_gapfill(
        e, "ts", 21600, ["event_type"],
        {"n": F.count(F.lit(1)),
         "sum_value": dsum(dec("value", 12))})
    return (out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"))
        .orderBy("event_type", "bucket"))


_DT_GAPFILL_SQL = """
WITH b AS (
  SELECT event_type,
         make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                        * 1000000) AS bucket,
         value
  FROM events),
agged AS (
  SELECT event_type, bucket, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
  FROM b GROUP BY 1, 2),
rng AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1),
spine AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 21600 SECOND)) AS bucket
  FROM rng)
SELECT s.event_type, strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       a.n, a.sum_value
FROM spine s LEFT JOIN agged a
  ON s.event_type = a.event_type AND s.bucket = a.bucket
ORDER BY s.event_type, bucket
"""


# --------------------------------------------------------------------------
# Ordered conversion funnel (operators/timebucket.funnel_stages): how
# far each user progressed through view -> click -> purchase, each step
# strictly after the previous in (ts, event_id) order. The engine is a
# sorted-array fold; the oracle is the sequential min-key chain -- two
# different formulations of "first occurrence after", so the hash match
# proves the fold's ordering semantics, not just its arithmetic.

def dt_funnel_stages(spark: SparkSession, sf: str) -> DataFrame:
    """Funnel gate: per reached stage -- user count and user-id xor
    (WHICH users converted, not just how many)."""
    from ..operators.timebucket import funnel_stages
    e = tbl(spark, sf, "events")
    st = funnel_stages(e, ["view", "click", "purchase"])
    return (st.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.bit_xor("user_id").alias("uid_xor"))
        .orderBy("stage"))


# sortable (ts, event_id) key: microsecond strftime + zero-padded id --
# lexicographic order == struct order (engine side sorts real structs;
# only the ORDER must agree, and both are total orders on (ts, id))
_SKEY = ("strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' "
         "|| lpad(CAST(event_id AS VARCHAR), 12, '0')")

_DT_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, {_SKEY} AS skey
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
base AS (SELECT DISTINCT user_id FROM ev),
t1 AS (
  SELECT user_id, MIN(skey) AS k1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.skey) AS k2
  FROM ev e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.skey > t1.k1
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.skey) AS k3
  FROM ev e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.skey > t2.k2
  GROUP BY e.user_id),
stages AS (
  SELECT b.user_id,
         CASE WHEN t3.user_id IS NOT NULL THEN 3
              WHEN t2.user_id IS NOT NULL THEN 2
              WHEN t1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS stage
  FROM base b
  LEFT JOIN t1 ON b.user_id = t1.user_id
  LEFT JOIN t2 ON b.user_id = t2.user_id
  LEFT JOIN t3 ON b.user_id = t3.user_id)
SELECT stage, COUNT(*) AS n_users, bit_xor(user_id) AS uid_xor
FROM stages GROUP BY stage ORDER BY stage
"""


def dt_interpolate_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-fill + linear interpolation (operators/timebucket.py
    bucket_gapfill -> interpolate_linear): 30-minute per-type rollups
    with empty buckets materialized, then every gap filled by linear
    interpolation between its non-null neighbors. Pins bucket/gap
    counts and the decimal-exact sum of the filled series."""
    from ..operators.timebucket import bucket_gapfill, interpolate_linear
    e = tbl(spark, sf, "events")
    gf = bucket_gapfill(e, "ts", 1800, ["event_type"],
                        {"sum_value": dsum(dec("value", 12))})
    ser = gf.select("event_type",
                    F.unix_timestamp("bucket").cast("bigint")
                    .alias("pos"),
                    F.col("sum_value").cast("double").alias("v"))
    out = interpolate_linear(ser, group_cols=["event_type"],
                             order_col="pos", value_col="v",
                             out_col="v_fill")
    return (out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_gaps"),
        F.sum(F.col("v_fill").isNull().cast("long"))
        .alias("n_edge_nulls"),
        F.sum(F.col("v_fill").cast("decimal(18,6)")).cast("double")
        .alias("sum_filled"))
        .orderBy("event_type"))


_DT_INTERP_SQL = """
WITH b AS (
  SELECT event_type,
         make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                        * 1000000) AS bucket,
         value
  FROM events),
agged AS (
  SELECT event_type, bucket,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
  FROM b GROUP BY 1, 2),
rng AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM b GROUP BY 1),
spine AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1800 SECOND)) AS bucket
  FROM rng),
series AS (
  SELECT s.event_type, CAST(epoch(s.bucket) AS BIGINT) AS pos, a.v
  FROM spine s LEFT JOIN agged a
    ON s.event_type = a.event_type AND s.bucket = a.bucket),
nb AS (
  SELECT event_type, pos, v,
         last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
           OVER wp AS po,
         first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER wn AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
           OVER wn AS nxo
  FROM series
  WINDOW wp AS (PARTITION BY event_type ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY event_type ORDER BY pos
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
filled AS (
  SELECT event_type, v,
         CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                round((pv + (nv - pv)
                       * (CAST(pos - po AS DOUBLE) / (nxo - po)))
                      * 1000000.0) / 1000000.0
         END AS v_fill
  FROM nb)
SELECT event_type, COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       CAST(SUM(CASE WHEN v_fill IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_edge_nulls,
       CAST(SUM(CAST(v_fill AS DECIMAL(18,6))) AS DOUBLE) AS sum_filled
FROM filled GROUP BY event_type ORDER BY event_type
"""


QUERIES: dict[str, QueryDef] = {
    "dt_interpolate_linear": QueryDef(dt_interpolate_linear,
                                      _DT_INTERP_SQL),
    "dt_funnel_stages": QueryDef(dt_funnel_stages, _DT_FUNNEL_SQL),
    "dt_bucket_gapfill": QueryDef(dt_bucket_gapfill, _DT_GAPFILL_SQL),
    "dt_extract_parts": QueryDef(dt_extract_parts, _DT_PARTS_SQL),
    "dt_time_parts": QueryDef(dt_time_parts, _DT_TIME_SQL),
    "dt_trunc_monthly_revenue": QueryDef(dt_trunc_monthly_revenue, _DT_TRUNC_SQL),
    "dt_arithmetic": QueryDef(dt_arithmetic, _DT_ARITH_SQL),
    "dt_format_patterns": QueryDef(dt_format_patterns, _DT_FORMAT_SQL),
    "dt_from_unix_make_date": QueryDef(dt_from_unix_make_date, _DT_MAKE_SQL),
    "dt_sessionize": QueryDef(dt_sessionize, _DT_SESSION_SQL),
}
