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


def sql_regexp_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake regex kernels with position/occurrence/parameters/group
    semantics (reference regexp_array_kernels.py): REGEXP_SUBSTR (2nd
    occurrence + 'e' group extract with 'i'), REGEXP_COUNT from a start
    position, REGEXP_INSTR start/end positions, anchored REGEXP_LIKE."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id,
                 concat('ab', CAST(event_id % 50 AS STRING), ' Xy',
                        CAST(event_id % 13 AS STRING), ' end') AS s
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               REGEXP_SUBSTR6(s, '[0-9]+', 1, 2, 'c', 0) AS sub2,
               REGEXP_SUBSTR6(s, 'x(y)', 1, 1, 'ie', 1) AS grp_ci,
               CAST(REGEXP_COUNT4(s, '[0-9]', 4, 'c') AS BIGINT) AS cnt,
               CAST(REGEXP_INSTR6(s, '[0-9]+', 1, 2, 0, 'c') AS BIGINT) AS pos2,
               CAST(REGEXP_INSTR6(s, '[0-9]+', 1, 2, 1, 'c') AS BIGINT) AS end2,
               CASE WHEN REGEXP_LIKE3(s, 'ab1.*END', 'is') THEN 1 ELSE 0 END AS full_ci
        FROM t ORDER BY id
    """).spark


_REGEXP_SQL = """
WITH t AS (
  SELECT event_id AS id,
         concat('ab', CAST(event_id % 50 AS VARCHAR), ' Xy',
                CAST(event_id % 13 AS VARCHAR), ' end') AS s
  FROM events WHERE event_id < 2000),
x AS (
  SELECT id, s,
         regexp_extract_all(s, '[0-9]+') AS ms,
         regexp_split_to_array(s, '[0-9]+') AS parts
  FROM t)
SELECT id,
       ms[2] AS sub2,
       regexp_extract(s, 'x(y)', 1, 'i') AS grp_ci,
       CAST(len(regexp_extract_all(substr(s, 4), '[0-9]')) AS BIGINT) AS cnt,
       CASE WHEN len(ms) < 2 THEN 0
            ELSE length(parts[1]) + length(parts[2]) + length(ms[1]) + 1
       END AS pos2,
       CASE WHEN len(ms) < 2 THEN 0
            ELSE length(parts[1]) + length(parts[2]) + length(ms[1]) + 1
                 + length(ms[2]) END AS end2,
       CASE WHEN regexp_full_match(s, 'ab1.*END', 'is') THEN 1 ELSE 0 END AS full_ci
FROM x ORDER BY id
"""


def sql_object_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured object kernels (reference variadic_array_kernels.py
    object_insert/object_keys/object_filter_keys,
    semi_structured_array_kernels.py get_path). Maps are canonicalized to
    sorted 'k=v' strings so the comparison is engine-neutral."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id,
                 map('a', CAST(event_id % 7 AS STRING), 'b', 'x') AS m,
                 props
          FROM events_sf WHERE event_id < 1000)
        SELECT id,
               concat_ws(',', OBJECT_KEYS(OBJECT_INSERT(m, 'c', 'v', false)))
                 AS keys_ins,
               concat_ws(',', transform(sort_array(map_entries(
                   OBJECT_DELETE2(m, 'b', 'zz'))),
                   e -> concat(e.key, '=', e.value))) AS del_b,
               concat_ws(',', transform(sort_array(map_entries(
                   OBJECT_PICK2(m, 'a', 'nope'))),
                   e -> concat(e.key, '=', e.value))) AS pick_a,
               concat_ws(',', transform(sort_array(map_entries(
                   OBJECT_FILTER_KEYS(m, array('b'), true))),
                   e -> concat(e.key, '=', e.value))) AS keep_b,
               GET_PATH(props, 'k') AS path_k
        FROM t ORDER BY id
    """).spark


_OBJECT_SQL = """
SELECT event_id AS id,
       'a,b,c' AS keys_ins,
       concat('a=', CAST(event_id % 7 AS VARCHAR)) AS del_b,
       concat('a=', CAST(event_id % 7 AS VARCHAR)) AS pick_a,
       'b=x' AS keep_b,
       json_extract_string(props, '$.k') AS path_k
FROM events WHERE event_id < 1000 ORDER BY id
"""


def dt_interval_diff_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """ADD_INTERVAL_* / DIFF_* / PREVIOUS_DAY family (reference
    datetime_array_kernels.py). DIFF_* asserts Snowflake DATEDIFF
    boundary-crossing semantics against an anchor timestamp."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (SELECT event_id AS id, ts FROM events_sf
                   WHERE event_id < 2000)
        SELECT id,
               date_format(ADD_INTERVAL_MONTHS(ts, 2),
                           'yyyy-MM-dd HH:mm:ss') AS plus_2m,
               date_format(ADD_INTERVAL_HOURS(ts, 36),
                           'yyyy-MM-dd HH:mm:ss') AS plus_36h,
               DIFF_DAYS(TIMESTAMP '2024-06-15 12:34:56', ts) AS dd,
               DIFF_MONTHS(TIMESTAMP '2024-06-15 12:34:56', ts) AS dm,
               DIFF_WEEKS(TIMESTAMP '2024-06-15 12:34:56', ts) AS dw,
               DIFF_HOURS(TIMESTAMP '2024-06-15 12:34:56', ts) AS dh,
               date_format(PREVIOUS_DAY(CAST(ts AS DATE), 'Friday'),
                           'yyyy-MM-dd') AS prev_fri
        FROM t ORDER BY id
    """).spark


_INTERVAL_DIFF_SQL = """
WITH t AS (SELECT event_id AS id, ts FROM events WHERE event_id < 2000)
SELECT id,
       strftime(ts + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_2m,
       strftime(ts + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_36h,
       date_diff('day', TIMESTAMP '2024-06-15 12:34:56', ts) AS dd,
       date_diff('month', TIMESTAMP '2024-06-15 12:34:56', ts) AS dm,
       date_diff('week', TIMESTAMP '2024-06-15 12:34:56', ts) AS dw,
       date_diff('hour', TIMESTAMP '2024-06-15 12:34:56', ts) AS dh,
       strftime(CAST(ts AS DATE)
                - CAST(CASE WHEN (dayofweek(CAST(ts AS DATE)) + 2) % 7 = 0
                            THEN 7
                            ELSE (dayofweek(CAST(ts AS DATE)) + 2) % 7 END
                       AS INTEGER),
                '%Y-%m-%d') AS prev_fri
FROM t ORDER BY id
"""


QUERIES: dict[str, QueryDef] = {
    "sql_conversion_funcs": QueryDef(sql_conversion_funcs, _CONVERSION_SQL),
    "dt_iso_week_funcs": QueryDef(dt_iso_week_funcs, _ISO_WEEK_SQL),
    "dt_time_slice_tz": QueryDef(dt_time_slice_tz, _TIME_SLICE_SQL),
    "str_jaro_winkler": QueryDef(str_jaro_winkler, _JARO_WINKLER_SQL),
    "str_parse_url": QueryDef(str_parse_url, _PARSE_URL_SQL),
    "sql_flatten_lateral": QueryDef(sql_flatten_lateral, _FLATTEN_SQL),
    "sql_regexp_funcs": QueryDef(sql_regexp_funcs, _REGEXP_SQL),
    "sql_object_funcs": QueryDef(sql_object_funcs, _OBJECT_SQL),
    "dt_interval_diff_funcs": QueryDef(
        dt_interval_diff_funcs, _INTERVAL_DIFF_SQL),
}
