"""Snowflake-dialect kernel battery (reference BodoSQL/bodosql/kernels/):
conversion semantics, ISO-week family, TIME_SLICE, CONVERT_TIMEZONE,
real Jaro-Winkler, parse_url, LATERAL FLATTEN's 6-output struct. Every
query runs through BodoSQLContext (shims registered as inlined SQL UDFs)
and has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, tbl


def _ctx(spark: SparkSession, sf: str, **tables):
    from ..sql import BodoSQLContext
    return BodoSQLContext(
        {name: tbl(spark, sf, src) for name, src in tables.items()},
        spark=spark)


def sql_conversion_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """TO_*/TRY_TO_* conversion kernels (reference
    snowflake_conversion_array_kernels.py): boolean token sets, NULL on
    unparseable input under TRY_, decimal/double casts."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id,
                 elt(CAST(event_id % 6 AS INT) + 1,
                     'true', 'no', '1', 'off', 'maybe', 'Y') AS bs,
                 concat(CAST(event_id % 100 AS STRING),
                        CASE WHEN event_id % 7 = 0 THEN 'x' ELSE '' END) AS ns
          FROM events_sf)
        SELECT COUNT(CASE WHEN TRY_TO_BOOLEAN(bs) THEN 1 END) AS n_true,
               COUNT(CASE WHEN TRY_TO_BOOLEAN(bs) = false THEN 1 END) AS n_false,
               COUNT(CASE WHEN TRY_TO_BOOLEAN(bs) IS NULL THEN 1 END) AS n_unparsed,
               CAST(SUM(TRY_TO_DECIMAL(ns)) AS BIGINT) AS dec_sum,
               COUNT(CASE WHEN TRY_TO_DECIMAL(ns) IS NULL THEN 1 END) AS n_bad_dec,
               round(SUM(TO_DOUBLE(CAST(event_id % 10 AS STRING))), 2) AS dbl_sum
        FROM t
    """).spark


_CONVERSION_SQL = """
WITH t AS (
  SELECT event_id,
         (['true','no','1','off','maybe','Y'])[CAST(event_id % 6 AS INT) + 1] AS bs,
         concat(CAST(event_id % 100 AS VARCHAR),
                CASE WHEN event_id % 7 = 0 THEN 'x' ELSE '' END) AS ns,
         CASE WHEN lower(trim((['true','no','1','off','maybe','Y'])[CAST(event_id % 6 AS INT) + 1]))
                   IN ('true','t','yes','y','on','1') THEN true
              WHEN lower(trim((['true','no','1','off','maybe','Y'])[CAST(event_id % 6 AS INT) + 1]))
                   IN ('false','f','no','n','off','0') THEN false
              ELSE NULL END AS b
  FROM events)
SELECT COUNT(CASE WHEN b THEN 1 END) AS n_true,
       COUNT(CASE WHEN b = false THEN 1 END) AS n_false,
       COUNT(CASE WHEN b IS NULL THEN 1 END) AS n_unparsed,
       CAST(SUM(TRY_CAST(ns AS DECIMAL(38,0))) AS BIGINT) AS dec_sum,
       COUNT(CASE WHEN TRY_CAST(ns AS DECIMAL(38,0)) IS NULL THEN 1 END) AS n_bad_dec,
       round(SUM(CAST(CAST(event_id % 10 AS VARCHAR) AS DOUBLE)), 2) AS dbl_sum
FROM t
"""


def dt_iso_week_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """ISO-week family (reference datetime_array_kernels.py):
    YEAROFWEEKISO / WEEKISO / DAYOFWEEKISO."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (SELECT CAST(ts AS DATE) AS d FROM events_sf)
        SELECT YEAROFWEEKISO(d) AS iso_year, WEEKISO(d) AS iso_week,
               COUNT(*) AS n,
               CAST(SUM(DAYOFWEEKISO(d)) AS BIGINT) AS dow_sum
        FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """).spark


_ISO_WEEK_SQL = """
WITH t AS (SELECT CAST(ts AS DATE) AS d FROM events)
SELECT CAST(isoyear(d) AS INT) AS iso_year, CAST(week(d) AS INT) AS iso_week,
       COUNT(*) AS n, CAST(SUM(isodow(d)) AS BIGINT) AS dow_sum
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def dt_time_slice_tz(spark: SparkSession, sf: str) -> DataFrame:
    """TIME_SLICE bucketing + CONVERT_TIMEZONE (Spark 4's builtin
    convert_timezone has Snowflake's argument shape; session tz is UTC).
    Timestamps are formatted to strings for engine-stable output."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        SELECT date_format(TIME_SLICE(ts, 15, 'MINUTE'),
                           'yyyy-MM-dd HH:mm:ss') AS slice_15m,
               COUNT(*) AS n,
               MIN(date_format(convert_timezone('UTC', 'America/New_York',
                                                CAST(ts AS TIMESTAMP_NTZ)),
                               'yyyy-MM-dd HH:mm:ss')) AS first_nyc
        FROM events_sf
        WHERE event_id < 2000
        GROUP BY 1 ORDER BY 1
    """).spark


_TIME_SLICE_SQL = """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)
                               * 1000000), '%Y-%m-%d %H:%M:%S') AS slice_15m,
       COUNT(*) AS n,
       MIN(strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York',
                    '%Y-%m-%d %H:%M:%S')) AS first_nyc
FROM events
WHERE event_id < 2000
GROUP BY 1 ORDER BY 1
"""


def str_jaro_winkler(spark: SparkSession, sf: str) -> DataFrame:
    """Real Jaro-Winkler similarity (reference string_array_kernels.py
    jarowinkler kernel; Snowflake returns an integer 0..100). All pairs
    of distinct event types -- a bounded cross join."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (SELECT DISTINCT event_type FROM events_sf)
        SELECT a.event_type AS t_a, b.event_type AS t_b,
               JAROWINKLER_SIMILARITY(a.event_type, b.event_type) AS jw
        FROM t a CROSS JOIN t b
        ORDER BY t_a, t_b
    """).spark


_JARO_WINKLER_SQL = """
WITH t AS (SELECT DISTINCT event_type FROM events)
SELECT a.event_type AS t_a, b.event_type AS t_b,
       CAST(floor(100 * jaro_winkler_similarity(a.event_type, b.event_type)
                  + 0.5) AS INT) AS jw
FROM t a CROSS JOIN t b
ORDER BY t_a, t_b
"""


def str_parse_url(spark: SparkSession, sf: str) -> DataFrame:
    """parse_url kernel (reference parse_url_array_kernel.py; Spark has
    it built in): HOST / PATH / single query parameter."""
    d = tbl(spark, sf, "documents").where(F.col("doc_id") < 100)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"), F.col("lang"),
                   F.lit("/doc/"), F.col("doc_id"),
                   F.lit("?q="), F.col("lang"),
                   F.lit("&p="), F.col("doc_id") % 7)
    return (d.select(
        F.col("doc_id"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("p")).alias("p_param"))
        .orderBy("doc_id"))


_PARSE_URL_SQL = """
WITH t AS (
  SELECT doc_id,
         concat('https://', source, '.example.com/', lang, '/doc/', doc_id,
                '?q=', lang, '&p=', doc_id % 7) AS url
  FROM documents WHERE doc_id < 100)
SELECT doc_id,
       regexp_extract(url, 'https://([^/]+)', 1) AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
       regexp_extract(url, '[?&]p=([^&]*)', 1) AS p_param
FROM t ORDER BY doc_id
"""


def sql_flatten_lateral(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL FLATTEN's full output struct (reference kernels/
    lateral.py:100): seq/key/path/index/value + the input array's size
    (``this``), over word arrays of short documents."""
    from ..functions import flatten
    d = (tbl(spark, sf, "documents").where(F.col("doc_id") < 50)
         .select("doc_id", F.split(F.trim("text"), r"\s+").alias("words")))
    fl = flatten(d, "words", seq_col="doc_id")
    return (fl.select(
        F.col("SEQ").alias("seq"), F.col("KEY").alias("key"),
        F.col("PATH").alias("path"), F.col("INDEX").alias("idx"),
        F.col("VALUE").alias("value"),
        F.size("THIS").alias("n_this"))
        .orderBy("seq", "idx"))


_FLATTEN_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
  FROM documents WHERE doc_id < 50),
ex AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM docs)
SELECT doc_id AS seq, CAST(NULL AS VARCHAR) AS key,
       concat('[', i - 1, ']') AS path, CAST(i - 1 AS INT) AS idx,
       arr[i] AS value, CAST(len(arr) AS INT) AS n_this
FROM ex ORDER BY seq, idx
"""


QUERIES: dict[str, QueryDef] = {
    "sql_conversion_funcs": QueryDef(sql_conversion_funcs, _CONVERSION_SQL),
    "dt_iso_week_funcs": QueryDef(dt_iso_week_funcs, _ISO_WEEK_SQL),
    "dt_time_slice_tz": QueryDef(dt_time_slice_tz, _TIME_SLICE_SQL),
    "str_jaro_winkler": QueryDef(str_jaro_winkler, _JARO_WINKLER_SQL),
    "str_parse_url": QueryDef(str_parse_url, _PARSE_URL_SQL),
    "sql_flatten_lateral": QueryDef(sql_flatten_lateral, _FLATTEN_SQL),
}
