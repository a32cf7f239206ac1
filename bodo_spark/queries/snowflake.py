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


def sql_time_tochar_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion phase 4 (reference snowflake_conversion_array_kernels
    to_time / timestamp_from_parts / to_char numeric formats): TO_TIME /
    TRY_TO_TIME over clock strings (bad rows NULL under TRY_),
    TIMESTAMP_FROM_PARTS, and TO_CHAR_NUM's [$][,][.dd] display subset.
    TIME is modeled as a 1970-01-01 timestamp (SURVEY 1.4), compared as
    formatted clock strings."""
    bc = _ctx(spark, sf, events_sf="events")
    # amt carries exactly two decimal digits so every display format is
    # rounding-free (a .xx5 half-way value would pit Java DecimalFormat
    # against fmtlib on the same binary double -- avoid by construction)
    return bc.sql("""
        WITH t AS (
          SELECT event_id,
                 concat(lpad(CAST(event_id % 24 AS STRING), 2, '0'), ':',
                        lpad(CAST(event_id % 60 AS STRING), 2, '0'), ':',
                        CASE WHEN event_id % 11 = 0 THEN 'xx'
                             ELSE lpad(CAST(event_id % 30 AS STRING), 2, '0')
                        END) AS clock,
                 CAST(event_id % 1000000 AS DOUBLE)
                   + CAST(event_id % 100 AS DOUBLE) / 100 AS amt
          FROM events_sf WHERE event_id < 2000)
        SELECT event_id,
               date_format(TRY_TO_TIME_SF(clock), 'HH:mm:ss') AS parsed_time,
               date_format(TIMESTAMP_FROM_PARTS(2024, 3,
                           CAST(event_id % 28 AS INT) + 1, 10, 30, 0),
                           'yyyy-MM-dd HH:mm:ss') AS ts_parts,
               TO_CHAR_NUM(amt, 'FM$9,999.00') AS money,
               TO_CHAR_NUM(amt, 'FM9999.00') AS plain2
        FROM t ORDER BY event_id
    """).spark


_TIME_TOCHAR_SQL = """
WITH t AS (
  SELECT event_id,
         concat(lpad(CAST(event_id % 24 AS VARCHAR), 2, '0'), ':',
                lpad(CAST(event_id % 60 AS VARCHAR), 2, '0'), ':',
                CASE WHEN event_id % 11 = 0 THEN 'xx'
                     ELSE lpad(CAST(event_id % 30 AS VARCHAR), 2, '0') END) AS clock,
         CAST(event_id % 1000000 AS BIGINT) AS ipart,
         event_id % 100 AS cents
  FROM events WHERE event_id < 2000)
SELECT event_id,
       strftime(DATE '1970-01-01' + TRY_CAST(clock AS TIME),
                '%H:%M:%S') AS parsed_time,
       strftime(make_timestamp(2024, 3, CAST(event_id % 28 AS INT) + 1,
                               10, 30, 0.0), '%Y-%m-%d %H:%M:%S') AS ts_parts,
       concat('$', format('{:,}', ipart), '.',
              lpad(CAST(cents AS VARCHAR), 2, '0')) AS money,
       concat(CAST(ipart AS VARCHAR), '.',
              lpad(CAST(cents AS VARCHAR), 2, '0')) AS plain2
FROM t ORDER BY event_id
"""


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


def sql_flatten_object(spark: SparkSession, sf: str) -> DataFrame:
    """FLATTEN over an OBJECT (MapType) column -- the r6 object-flatten
    contract under the gate: KEY populated, PATH = KEY, INDEX NULL,
    THIS the whole map (reference kernels/lateral.py object flatten).
    The map is built deterministically from two document columns."""
    from ..functions import flatten
    d = (tbl(spark, sf, "documents").where(F.col("doc_id") < 50)
         .select("doc_id",
                 F.create_map(F.lit("lang"), F.col("lang"),
                              F.lit("src"), F.col("source")).alias("m")))
    fl = flatten(d, "m", seq_col="doc_id")
    return (fl.select(
        F.col("SEQ").alias("seq"), F.col("KEY").alias("key"),
        F.col("PATH").alias("path"),
        F.col("INDEX").cast("int").alias("idx"),
        F.col("VALUE").alias("value"),
        F.size("THIS").alias("n_this"))
        .orderBy("seq", "key"))


_FLATTEN_OBJ_SQL = """
WITH d AS (SELECT doc_id, lang, source FROM documents WHERE doc_id < 50),
kv AS (
  SELECT doc_id, 'lang' AS k, lang AS v FROM d
  UNION ALL
  SELECT doc_id, 'src' AS k, source AS v FROM d)
SELECT doc_id AS seq, k AS key, k AS path, CAST(NULL AS INT) AS idx,
       v AS value, 2 AS n_this
FROM kv ORDER BY seq, key
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
               CASE WHEN REGEXP_LIKE3(s, 'ab1.*END', 'is') THEN 1 ELSE 0 END AS full_ci,
               REGEXP_REPLACE6(s, '[0-9]+', '#', 1, 0, 'c') AS rep_all,
               REGEXP_REPLACE6(s, '[0-9]+', '#', 4, 1, 'c') AS rep_pos4,
               REGEXP_REPLACE6(s, 'xy', '@', 1, 1, 'i') AS rep_ci
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
       CASE WHEN regexp_full_match(s, 'ab1.*END', 'is') THEN 1 ELSE 0 END AS full_ci,
       regexp_replace(s, '[0-9]+', '#', 'g') AS rep_all,
       concat(substr(s, 1, 3), regexp_replace(substr(s, 4), '[0-9]+', '#'))
         AS rep_pos4,
       regexp_replace(s, 'xy', '@', 'i') AS rep_ci
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


def sql_str_kernels2(spark: SparkSession, sf: str) -> DataFrame:
    """Phase-3 string kernels (reference string_array_kernels.py insert,
    strtok_to_array, rtrimmed_length, strcmp, contains, position, hex/
    base64 codecs). UUID5 is pytest-verified against Python's uuid5
    (DuckDB has no sha1)."""
    bc = _ctx(spark, sf, customer_sf="customer")
    return bc.sql("""
        SELECT c_custkey AS id,
               INSERT4(c_name, 4, 2, '##') AS ins,
               concat_ws('|', STRTOK_TO_ARRAY(c_name, '#0 ')) AS toks,
               RTRIMMED_LENGTH(concat(c_name, '   ')) AS rtl,
               STRCMP(c_name, c_mktsegment) AS sc,
               CONTAINS_STR(c_name, '1') AS has1,
               POSITION3('0', c_name, 5) AS p0,
               HEX_ENCODE(c_mktsegment) AS hexd,
               HEX_DECODE_STRING(HEX_ENCODE(c_name)) AS hex_rt,
               BASE64_DECODE_STRING(BASE64_ENCODE(c_name)) AS b64_rt
        FROM customer_sf WHERE c_custkey < 2000 ORDER BY id
    """).spark


_STR_KERNELS2_SQL = """
SELECT c_custkey AS id,
       concat(substr(c_name, 1, 3), '##', substr(c_name, 6)) AS ins,
       array_to_string(list_filter(regexp_split_to_array(c_name, '[#0 ]'),
                                   x -> x <> ''), '|') AS toks,
       length(rtrim(concat(c_name, '   '))) AS rtl,
       CASE WHEN c_name < c_mktsegment THEN -1
            WHEN c_name > c_mktsegment THEN 1 ELSE 0 END AS sc,
       instr(c_name, '1') > 0 AS has1,
       CASE WHEN instr(substr(c_name, 5), '0') = 0 THEN 0
            ELSE instr(substr(c_name, 5), '0') + 4 END AS p0,
       upper(hex(c_mktsegment)) AS hexd,
       c_name AS hex_rt,
       c_name AS b64_rt
FROM customer WHERE c_custkey < 2000 ORDER BY id
"""


def sql_format_conv_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake format-string conversion (reference
    snowflake_conversion_array_kernels.py to_char/to_timestamp +
    convert_snowflake_date_format_str_to_py_format): TO_CHAR_TS with
    date/12-hour/name tokens, TO_TIMESTAMP_SF/TRY_TO_DATE_SF parses,
    TRY_ returning NULL on garbage."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        SELECT event_id AS id,
               TO_CHAR_TS(ts, 'YYYY-MM-DD HH24:MI:SS') AS c24,
               TO_CHAR_TS(ts, 'DY DD MON YYYY HH12:MI AM') AS c12,
               CAST(TO_TIMESTAMP_SF(TO_CHAR_TS(ts, 'YYYY-MM-DD HH24:MI:SS'),
                                    'YYYY-MM-DD HH24:MI:SS') AS STRING) AS rt,
               CAST(TRY_TO_DATE_SF(TO_CHAR_TS(ts, 'DD/MM/YYYY'),
                                   'DD/MM/YYYY') AS STRING) AS rtd,
               TRY_TO_TIMESTAMP_SF(event_type, 'YYYY-MM-DD') IS NULL AS bad
        FROM events_sf WHERE event_id < 2000 ORDER BY id
    """).spark


_FORMAT_CONV_SQL = """
SELECT event_id AS id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS c24,
       strftime(ts, '%a %d %b %Y %I:%M %p') AS c12,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS rt,
       strftime(ts, '%Y-%m-%d') AS rtd,
       true AS bad
FROM events WHERE event_id < 2000 ORDER BY id
"""


def sql_bool_bit_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean 3VL + bitwise + geo kernels (reference
    other_array_kernels.py booland/boolor/boolxor/regr_valx,
    numeric_array_kernels.py bitand/bitshift/haversine, datetime
    makedate)."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id,
                 CASE WHEN event_id % 3 = 0 THEN NULL
                      ELSE CAST(event_id % 2 AS DOUBLE) END AS a,
                 CAST(event_id % 4 AS DOUBLE) AS b,
                 value
          FROM events_sf WHERE event_id < 5000)
        SELECT event_id AS id,
               BOOLAND(a, b) AS band, BOOLOR(a, b) AS bor,
               BOOLXOR(a, b) AS bxor, BOOLNOT(a) AS bnot,
               NOT_EQUAL_NULL(CAST(a AS STRING), CAST(b AS STRING)) AS neq,
               REGR_VALX(a, b) AS rvx, REGR_VALY(a, b) AS rvy,
               BITAND(event_id, 255) AS band8,
               BITOR(event_id, 16) AS bor16,
               BITXOR(event_id, 85) AS bx85,
               BITNOT(event_id) AS bneg,
               BITSHIFTLEFT(event_id % 100, 3) AS shl,
               BITSHIFTRIGHT(event_id, 2) AS shr,
               round(HAVERSINE(CAST(event_id % 90 AS DOUBLE),
                               CAST(event_id % 180 AS DOUBLE),
                               45.0, 90.0), 4) AS hav,
               CAST(MAKEDATE(2020 + CAST(event_id % 5 AS INT),
                             1 + CAST(event_id % 365 AS INT)) AS STRING) AS md
        FROM t ORDER BY id
    """).spark


_BOOL_BIT_SQL = """
WITH t AS (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN NULL
              ELSE CAST(event_id % 2 AS DOUBLE) END AS a,
         CAST(event_id % 4 AS DOUBLE) AS b,
         value
  FROM events WHERE event_id < 5000)
SELECT event_id AS id,
       (a <> 0) AND (b <> 0) AS band, (a <> 0) OR (b <> 0) AS bor,
       (a <> 0) <> (b <> 0) AS bxor, NOT (a <> 0) AS bnot,
       NOT (CAST(a AS VARCHAR) IS NOT DISTINCT FROM CAST(b AS VARCHAR)) AS neq,
       CASE WHEN a IS NOT NULL THEN b END AS rvx,
       CASE WHEN b IS NOT NULL THEN a END AS rvy,
       event_id & 255 AS band8,
       event_id | 16 AS bor16,
       xor(event_id, 85) AS bx85,
       ~event_id AS bneg,
       (event_id % 100) << 3 AS shl,
       event_id >> 2 AS shr,
       round(2 * 6371 * asin(sqrt(
         pow(sin(radians(45.0 - CAST(event_id % 90 AS DOUBLE)) / 2), 2)
         + cos(radians(CAST(event_id % 90 AS DOUBLE))) * cos(radians(45.0))
         * pow(sin(radians(90.0 - CAST(event_id % 180 AS DOUBLE)) / 2), 2))),
         4) AS hav,
       strftime(make_date(2020 + CAST(event_id % 5 AS INT), 1, 1)
                + (CAST(event_id % 365 AS INT)), '%Y-%m-%d') AS md
FROM t ORDER BY id
"""


def sql_object_construct_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Variadic OBJECT_CONSTRUCT family with Snowflake null semantics
    (reference variadic_array_kernels.py object_construct[_keep_null]):
    null VALUES drop unless KEEP_NULL; null KEYS always drop. Maps
    canonicalized to sorted k=v strings. Also the JSON variant
    predicates (variant_array_kernels.py is_array/is_object)."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id,
                 CAST(event_id % 7 AS STRING) AS v1,
                 CASE WHEN event_id % 3 = 0 THEN NULL
                      ELSE 'x' END AS v2,
                 props
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               concat_ws(',', transform(sort_array(map_entries(
                   OBJECT_CONSTRUCT3('a', v1, 'b', v2, 'c', 'z'))),
                   e -> concat(e.key, '=', e.value))) AS oc3,
               concat_ws(',', transform(sort_array(map_entries(
                   OBJECT_CONSTRUCT_KEEP_NULL2('a', v1, 'b', v2))),
                   e -> concat(e.key, '=', coalesce(e.value, '<null>'))))
                 AS ockn2,
               size(OBJECT_CONSTRUCT4('a', v1, 'b', v2, 'c', 'z',
                                      CAST(NULL AS STRING), 'q')) AS n4,
               IS_OBJECT_JSON(props) AS isobj,
               IS_ARRAY_JSON(props) AS isarr,
               JSON_EXTRACT_PATH_TEXT(props, 'k') AS jk
        FROM t ORDER BY id
    """).spark


_OBJECT_CONSTRUCT_SQL = """
WITH t AS (
  SELECT event_id AS id,
         CAST(event_id % 7 AS VARCHAR) AS v1,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE 'x' END AS v2,
         props
  FROM events WHERE event_id < 2000)
SELECT id,
       CASE WHEN v2 IS NULL THEN concat('a=', v1, ',c=z')
            ELSE concat('a=', v1, ',b=x,c=z') END AS oc3,
       CASE WHEN v2 IS NULL THEN concat('a=', v1, ',b=<null>')
            ELSE concat('a=', v1, ',b=x') END AS ockn2,
       CASE WHEN v2 IS NULL THEN 2 ELSE 3 END AS n4,
       ltrim(props) LIKE '{%' AS isobj,
       ltrim(props) LIKE '[%' AS isarr,
       json_extract_string(props, '$.k') AS jk
FROM t ORDER BY id
"""


def sql_array_kernel_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake array kernels where semantics differ from Spark builtins
    (reference nested_data_kernels.py): exclusive-end GENERATE_RANGE,
    0-based SLICE/POSITION, reversed-arg CONTAINS, TO_STRING, CAT."""
    bc = _ctx(spark, sf, customer_sf="customer")
    return bc.sql("""
        WITH t AS (
          SELECT c_custkey AS id, c_mktsegment AS seg,
                 STRTOK_TO_ARRAY(c_name, '#') AS toks
          FROM customer_sf WHERE c_custkey < 2000)
        SELECT id,
               ARRAY_TO_STRING(ARRAY_GENERATE_RANGE(0, id % 11, 3), ',')
                 AS rng,
               ARRAY_TO_STRING(ARRAY_GENERATE_RANGE(id % 5, -1, -2), ',')
                 AS rng_neg,
               ARRAY_TO_STRING(ARRAY_SLICE(toks, 0, 1), ',') AS sl,
               ARRAY_POSITION_SF(seg, ARRAY_CAT(toks, array(seg))) AS pos,
               ARRAY_CONTAINS_SF(seg, array('BUILDING', 'AUTOMOBILE'))
                 AS inseg,
               ARRAY_TO_STRING(ARRAY_CAT(toks, array(seg)), '|') AS cat
        FROM t ORDER BY id
    """).spark


_ARRAY_KERNEL_SQL = """
WITH t AS (
  SELECT c_custkey AS id, c_mktsegment AS seg,
         list_filter(regexp_split_to_array(c_name, '[#]'), x -> x <> '')
           AS toks
  FROM customer WHERE c_custkey < 2000)
SELECT id,
       coalesce(array_to_string(range(0, CAST(id % 11 AS BIGINT), 3), ','),
                '') AS rng,
       coalesce(array_to_string(range(CAST(id % 5 AS BIGINT), -1, -2), ','),
                '') AS rng_neg,
       array_to_string(toks[1:1], ',') AS sl,
       CAST(list_position(list_concat(toks, [seg]), seg) - 1 AS INT) AS pos,
       list_contains(['BUILDING', 'AUTOMOBILE'], seg) AS inseg,
       array_to_string(list_concat(toks, [seg]), '|') AS cat
FROM t ORDER BY id
"""


def sql_dialect_tail_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Round-5 audit stragglers: LAST_DAY_UNIT (quarter/year/week ends),
    bounded EDITDISTANCE (Snowflake clamp), CHARINDEX from a position,
    TO_NUMBER_FMT display-format parsing."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id, CAST(ts AS DATE) AS d, event_type
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               CAST(LAST_DAY_UNIT(d, 'QUARTER') AS STRING) AS q_end,
               CAST(LAST_DAY_UNIT(d, 'YEAR') AS STRING) AS y_end,
               CAST(LAST_DAY_UNIT(d, 'WEEK') AS STRING) AS w_end,
               EDITDISTANCE3(event_type, 'purchase', 3) AS ed3,
               CHARINDEX('c', event_type, 2) AS ci,
               CAST(TO_NUMBER_FMT(concat('$', CAST(id AS STRING), ',000.25'),
                                  12, 2) AS DOUBLE) AS amt
        FROM t ORDER BY id
    """).spark


_DIALECT_TAIL_SQL = """
WITH t AS (
  SELECT event_id AS id, CAST(ts AS DATE) AS d, event_type
  FROM events WHERE event_id < 2000)
SELECT id,
       strftime(date_trunc('quarter', d) + INTERVAL 3 MONTH - INTERVAL 1 DAY,
                '%Y-%m-%d') AS q_end,
       strftime(make_date(year(d), 12, 31), '%Y-%m-%d') AS y_end,
       strftime(date_trunc('week', d) + INTERVAL 6 DAY, '%Y-%m-%d') AS w_end,
       CASE WHEN levenshtein(event_type, 'purchase') > 3 THEN 3
            ELSE levenshtein(event_type, 'purchase') END AS ed3,
       CASE WHEN instr(substr(event_type, 2), 'c') = 0 THEN 0
            ELSE instr(substr(event_type, 2), 'c') + 1 END AS ci,
       CAST(replace(replace(concat('$', CAST(id AS VARCHAR), ',000.25'),
                            ',', ''), '$', '') AS DOUBLE) AS amt
FROM t ORDER BY id
"""


def sql_array_multiset_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Phase-5 array kernels where Spark builtins are NOT drop-in
    (reference nested_data_kernels.py): MULTISET except/intersection
    (each right element cancels at most one left occurrence, order kept,
    NULL matches NULL -- Spark's array_except/intersect dedupe),
    0-based/negative ARRAY_REMOVE_AT, ARRAY_SORT with
    (sort_ascending, nulls_first) flags, and GET_IGNORE_CASE over the
    VARIANT-as-map model (other_array_kernels.py)."""
    bc = _ctx(spark, sf, customer_sf="customer")
    return bc.sql("""
        WITH t AS (
          SELECT c_custkey AS id, c_mktsegment AS seg,
                 array(c_mktsegment, 'BUILDING', c_mktsegment, NULL,
                       'MACHINERY') AS a,
                 array('BUILDING', c_mktsegment, NULL, 'FURNITURE') AS b
          FROM customer_sf WHERE c_custkey < 2000)
        SELECT id,
               ARRAY_TO_STRING(ARRAY_EXCEPT_SF(a, b), ',') AS ex,
               ARRAY_TO_STRING(ARRAY_INTERSECTION_SF(a, b), ',') AS inter,
               ARRAY_TO_STRING(ARRAY_REMOVE_AT(a, CAST(id % 7 AS INT) - 2),
                               ',') AS rm_at,
               ARRAY_TO_STRING(ARRAY_SORT_SF(a, id % 2 = 0, id % 3 = 0),
                               ',') AS srt,
               GET_IGNORE_CASE(ARRAYS_TO_OBJECT(array('Seg', 'Id'),
                   array(seg, CAST(id AS STRING))), 'sEg') AS gic
        FROM t ORDER BY id
    """).spark


_ARRAY_MULTISET_SQL = """
WITH t AS (
  SELECT c_custkey AS id, c_mktsegment AS seg,
         [c_mktsegment, 'BUILDING', c_mktsegment, NULL, 'MACHINERY'] AS a,
         ['BUILDING', c_mktsegment, NULL, 'FURNITURE'] AS b
  FROM customer WHERE c_custkey < 2000)
SELECT id,
  array_to_string(list_transform(
    list_filter(a, (x, i) ->
      len(list_filter(a[1:i], y -> y IS NOT DISTINCT FROM x))
        > len(list_filter(b, y -> y IS NOT DISTINCT FROM x))),
    x -> coalesce(x, '')), ',') AS ex,
  array_to_string(list_transform(
    list_filter(a, (x, i) ->
      len(list_filter(a[1:i], y -> y IS NOT DISTINCT FROM x))
        <= len(list_filter(b, y -> y IS NOT DISTINCT FROM x))),
    x -> coalesce(x, '')), ',') AS inter,
  array_to_string(list_transform(
    list_filter(a, (x, i) -> i - 1 !=
      CASE WHEN CAST(id % 7 AS INT) - 2 < 0
           THEN len(a) + CAST(id % 7 AS INT) - 2
           ELSE CAST(id % 7 AS INT) - 2 END),
    x -> coalesce(x, '')), ',') AS rm_at,
  array_to_string(list_transform(
    CASE WHEN id % 2 = 0 AND id % 3 = 0 THEN list_sort(a, 'ASC', 'NULLS FIRST')
         WHEN id % 2 = 0 THEN list_sort(a, 'ASC', 'NULLS LAST')
         WHEN id % 3 = 0 THEN list_sort(a, 'DESC', 'NULLS FIRST')
         ELSE list_sort(a, 'DESC', 'NULLS LAST') END,
    x -> coalesce(x, '')), ',') AS srt,
  seg AS gic
FROM t ORDER BY id
"""


def dt_daynum_tz_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """MySQL day-number epoch family (reference datetime_array_kernels.py
    to_days/from_days/to_seconds: day 719528 = 1970-01-01) plus Spark 4's
    builtin CONVERT_TIMEZONE with Snowflake's argument shape (crosses the
    US DST boundary when the event range does)."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id, CAST(ts AS DATE) AS d, ts
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               TO_DAYS(d) AS days,
               CAST(FROM_DAYS(TO_DAYS(d) + id % 1000) AS STRING) AS fd,
               TO_SECONDS(ts) AS secs,
               date_format(convert_timezone('UTC', 'America/New_York',
                   CAST(ts AS TIMESTAMP_NTZ)), 'yyyy-MM-dd HH:mm:ss') AS nyc
        FROM t ORDER BY id
    """).spark


_DAYNUM_TZ_SQL = """
WITH t AS (
  SELECT event_id AS id, CAST(ts AS DATE) AS d, ts
  FROM events WHERE event_id < 2000)
SELECT id,
  datediff('day', DATE '1970-01-01', d) + 719528 AS days,
  strftime(d + CAST(id % 1000 AS INT), '%Y-%m-%d') AS fd,
  CAST(floor(epoch(ts)) AS BIGINT) + CAST(719528 AS BIGINT) * 86400 AS secs,
  strftime(timezone('America/New_York', timezone('UTC', ts)),
           '%Y-%m-%d %H:%M:%S') AS nyc
FROM t ORDER BY id
"""


def sql_dialect_phase6_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Phase-6 kernels: INITCAP with an explicit delimiter set
    (reference string_array_kernels.py initcap 2-arg; Spark's builtin
    splits on whitespace only), TYPEOF over VARIANT-as-JSON-text
    (variant_array_kernels.py), ROUND with Snowflake's rounding-mode
    argument (HALF_TO_EVEN = banker's), TRY_TO_NUMBER with display
    format."""
    bc = _ctx(spark, sf, customer_sf="customer")
    return bc.sql("""
        WITH t AS (
          SELECT c_custkey AS id,
                 lower(replace(c_name, '#', '-')) AS nm,
                 elt(CAST(c_custkey % 7 AS INT) + 1, '123', '-4.5',
                     '6.7e2', '"str"', '[1,2]', '{"a":1}', 'true') AS js,
                 CAST(c_custkey % 100 AS DOUBLE) - 50 + 0.5 AS x,
                 concat('$', CAST(c_custkey % 90 AS STRING),
                        CASE WHEN c_custkey % 5 = 0 THEN 'x'
                             ELSE ',250.75' END) AS numstr
          FROM customer_sf WHERE c_custkey < 2000)
        SELECT id,
               INITCAP2(nm, '-us') AS ic,
               TYPEOF_JSON(js) AS ty,
               ROUND_SF(x, 0, 'HALF_AWAY_FROM_ZERO') AS r_away,
               ROUND_SF(x, 0, 'HALF_TO_EVEN') AS r_even,
               CAST(TRY_TO_NUMBER_FMT(numstr, 12, 2) AS DOUBLE) AS amt
        FROM t ORDER BY id
    """).spark


_DIALECT_PHASE6_SQL = """
WITH t AS (
  SELECT c_custkey AS id,
         lower(replace(c_name, '#', '-')) AS nm,
         CASE CAST(c_custkey % 7 AS INT) WHEN 0 THEN '123' WHEN 1 THEN '-4.5'
              WHEN 2 THEN '6.7e2' WHEN 3 THEN '"str"' WHEN 4 THEN '[1,2]'
              WHEN 5 THEN '{"a":1}' ELSE 'true' END AS js,
         CAST(c_custkey % 100 AS DOUBLE) - 50 + 0.5 AS x,
         concat('$', CAST(c_custkey % 90 AS VARCHAR),
                CASE WHEN c_custkey % 5 = 0 THEN 'x'
                     ELSE ',250.75' END) AS numstr
  FROM customer WHERE c_custkey < 2000)
SELECT id,
  array_to_string(list_transform(string_split(nm, ''), (c, i) ->
    CASE WHEN i = 1 OR instr('-us', list_extract(string_split(nm, ''), i - 1)) > 0
         THEN upper(c) ELSE c END), '') AS ic,
  CASE WHEN ltrim(js) LIKE '[%' THEN 'ARRAY'
       WHEN ltrim(js) LIKE '{%' THEN 'OBJECT'
       WHEN trim(js) = 'null' THEN 'NULL_VALUE'
       WHEN trim(js) IN ('true', 'false') THEN 'BOOLEAN'
       WHEN regexp_full_match(trim(js), '-?[0-9]+') THEN 'INTEGER'
       WHEN regexp_full_match(trim(js), '-?[0-9]*\\.[0-9]+') THEN 'DECIMAL'
       WHEN regexp_full_match(trim(js), '-?[0-9]*\\.?[0-9]+[eE][+-]?[0-9]+')
         THEN 'DOUBLE'
       ELSE 'VARCHAR' END AS ty,
  round(x, 0) AS r_away,
  round_even(x, 0) + 0.0 AS r_even,
  TRY_CAST(replace(replace(trim(numstr), ',', ''), '$', '') AS DOUBLE) AS amt
FROM t ORDER BY id
"""


def sql_variant_native(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake VARIANT on Spark 4's NATIVE VariantType (reference
    variant_array_kernels.py / PARSE_JSON): parse_json -> binary
    variant, path navigation incl. array subscripts via variant_get,
    TRY_ semantics for missing paths, is_variant_null for JSON null --
    not the string-shim model, the real columnar variant encoding."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH j AS (
          SELECT event_id AS id,
                 parse_json(concat(
                   '{"meta": {"type": "', event_type, '", "ks": [',
                   CAST(event_id % 7 AS STRING), ',',
                   CAST(event_id % 11 AS STRING), ']}, "v": ',
                   CAST(CAST(value AS DECIMAL(12,2)) AS STRING),
                   ', "z": null}')) AS v
          FROM events_sf WHERE event_id < 3000)
        SELECT id,
               variant_get(v, '$.meta.type', 'string') AS mtype,
               variant_get(v, '$.meta.ks[1]', 'bigint') AS k2,
               CAST(variant_get(v, '$.v', 'double') AS DOUBLE) AS val,
               try_variant_get(v, '$.missing', 'int') AS miss,
               is_variant_null(variant_get(v, '$.z')) AS znull
        FROM j ORDER BY id
    """).spark


_VARIANT_NATIVE_SQL = """
WITH j AS (
  SELECT event_id AS id,
         concat('{"meta": {"type": "', event_type, '", "ks": [',
                CAST(event_id % 7 AS VARCHAR), ',',
                CAST(event_id % 11 AS VARCHAR), ']}, "v": ',
                CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR),
                ', "z": null}') AS js
  FROM events WHERE event_id < 3000)
SELECT id,
       json_extract_string(js, '$.meta.type') AS mtype,
       CAST(json_extract(js, '$.meta.ks[1]') AS BIGINT) AS k2,
       CAST(json_extract(js, '$.v') AS DOUBLE) AS val,
       CAST(NULL AS INT) AS miss,
       json_type(js, '$.z') = 'NULL' AS znull
FROM j ORDER BY id
"""


def dt_numeric_scaling(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake numeric TO_TIMESTAMP magnitude auto-scaling (reference
    number_to_datetime): the same instant expressed as seconds, millis,
    micros and nanos must all round-trip through the thresholds."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id, unix_timestamp(ts) AS es
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               date_format(TO_TIMESTAMP_NUM(es), 'yyyy-MM-dd HH:mm:ss')
                 AS from_s,
               date_format(TO_TIMESTAMP_NUM(es * 1000 + 250),
                           'yyyy-MM-dd HH:mm:ss.SSS') AS from_ms,
               date_format(TO_TIMESTAMP_NUM(es * 1000000 + 250750),
                           'yyyy-MM-dd HH:mm:ss.SSS') AS from_us,
               date_format(TO_TIMESTAMP_NUM(es * 1000000000 + 250750999),
                           'yyyy-MM-dd HH:mm:ss.SSS') AS from_ns
        FROM t ORDER BY id
    """).spark


_DT_NUMERIC_SCALING_SQL = """
WITH t AS (
  SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE event_id < 2000)
SELECT id,
  strftime(to_timestamp(es), '%Y-%m-%d %H:%M:%S') AS from_s,
  strftime(epoch_ms(es * 1000 + 250), '%Y-%m-%d %H:%M:%S.%g') AS from_ms,
  strftime(make_timestamp(es * 1000000 + 250750),
           '%Y-%m-%d %H:%M:%S.%g') AS from_us,
  strftime(make_timestamp((es * 1000000000 + 250750999) // 1000),
           '%Y-%m-%d %H:%M:%S.%g') AS from_ns
FROM t ORDER BY id
"""


def sql_generator_rowcount(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake GENERATOR row source (reference BodoSQL test_lateral.py
    GENERATOR tests) rewritten to Spark's distributed range() TVF, both
    standalone and as a per-row LATERAL fan-out."""
    bc = _ctx(spark, sf, nation_sf="nation")
    return bc.sql("""
        SELECT n.n_regionkey AS rk,
               COUNT(*) AS n_rows,
               CAST(SUM(g.id) AS BIGINT) AS id_sum
        FROM nation_sf n, LATERAL TABLE(GENERATOR(ROWCOUNT => 12)) g
        GROUP BY n.n_regionkey
        ORDER BY rk
    """).spark


_GENERATOR_SQL = """
SELECT n.n_regionkey AS rk,
       COUNT(*) AS n_rows,
       CAST(SUM(g.range) AS BIGINT) AS id_sum
FROM nation n, range(12) g
GROUP BY n.n_regionkey
ORDER BY rk
"""


def sql_numeric_format_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """TO_CHAR numeric display masks + mask-honoring TO_NUMBER
    (reference snowflake_conversion_array_kernels.py TO_CHAR(number) /
    TO_NUMBER(prec, scale)): space-padded 9-masks with grouping,
    FM fill mode, $-currency with correct '-$' sign placement, 0-forced
    digit positions, trailing-sign MI, always-signed S, '#' overflow
    fill, scale-rounding and precision-overflow NULL under TRY_.
    Values are built from integer (units, cents) pairs so every display
    is rounding-free except the columns that TEST rounding (third
    decimal digit 7; half-away ties at .50 cents)."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id,
                 CAST(event_id % 10000 AS BIGINT) AS n,
                 CAST(event_id % 100 AS BIGINT) AS c,
                 (event_id % 3 = 0) AS neg
          FROM events_sf WHERE event_id < 2000),
        v AS (
          SELECT id, n, c, neg,
                 concat(CASE WHEN neg THEN '-' ELSE '' END,
                        CAST(n AS STRING), '.',
                        lpad(CAST(c AS STRING), 2, '0')) AS xstr
          FROM t),
        x AS (SELECT id, n, c, neg, xstr,
                     CAST(xstr AS DOUBLE) AS xv FROM v)
        SELECT id,
               TO_CHAR_NUM(xv, '999,999.99') AS pad_grp,
               TO_CHAR_NUM(xv, 'FM$9,999,990.00') AS fm_money,
               TO_CHAR_NUM(abs(xv), 'FM00000.00') AS zpad,
               TO_CHAR_NUM(xv, '99999MI') AS mi_sign,
               TO_CHAR_NUM(xv, 'FMS99999.99') AS s_sign,
               TO_CHAR_NUM(CAST(id % 1000 AS DOUBLE), '99') AS ovf,
               CAST(TO_NUMBER_FMT(concat(CASE WHEN neg THEN '-' ELSE ''
                                         END, '$', CAST(n AS STRING), '.',
                                         lpad(CAST(c AS STRING), 2, '0'),
                                         '7'), 12, 2) AS DOUBLE) AS parsed,
               CAST(TRY_TO_NUMBER_FMT(xstr, 4, 2) AS DOUBLE) AS bounded
        FROM x ORDER BY id
    """).spark


_NUMERIC_FORMAT_SQL = """
WITH t AS (
  SELECT event_id AS id,
         CAST(event_id % 10000 AS BIGINT) AS n,
         CAST(event_id % 100 AS BIGINT) AS c,
         (event_id % 3 = 0) AS neg
  FROM events WHERE event_id < 2000),
v AS (SELECT id, n, c, neg,
             -- a -0.00 input is IEEE negative zero: not < 0, so the
             -- formatter shows no sign (matches Spark's x < 0 checks)
             (neg AND (n > 0 OR c > 0)) AS isneg,
             CASE WHEN neg AND (n > 0 OR c > 0) THEN '-' ELSE '' END AS sgn,
             format('{:,}', n) AS ngrp,
             lpad(CAST(c AS VARCHAR), 2, '0') AS cc
      FROM t)
SELECT id,
  lpad(concat(sgn, ngrp, '.', cc), 11, ' ') AS pad_grp,
  concat(sgn, '$', ngrp, '.', cc) AS fm_money,
  concat(lpad(CAST(n AS VARCHAR), 5, '0'), '.', cc) AS zpad,
  concat(lpad(CAST(n + CASE WHEN c >= 50 THEN 1 ELSE 0 END AS VARCHAR),
              5, ' '),
         CASE WHEN isneg THEN '-' ELSE ' ' END) AS mi_sign,
  concat(CASE WHEN isneg THEN '-' ELSE '+' END,
         CAST(n AS VARCHAR), '.', cc) AS s_sign,
  CASE WHEN id % 1000 >= 100 THEN '##'
       ELSE lpad(CAST(id % 1000 AS VARCHAR), 3, ' ') END AS ovf,
  CAST((CASE WHEN neg THEN -1 ELSE 1 END)
       * CAST(n * 100 + c + 1 AS DECIMAL(38,6)) / 100 AS DOUBLE) AS parsed,
  CASE WHEN n >= 100 THEN NULL
       ELSE CAST((CASE WHEN neg THEN -1 ELSE 1 END)
            * CAST(n * 100 + c AS DECIMAL(38,6)) / 100 AS DOUBLE)
  END AS bounded
FROM v ORDER BY id
"""


def sql_uniform_binary_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """UNIFORM/UNIFORM_FLOAT (reference other_array_kernels.py:1075:
    deterministic per-row generator, int domain [lo, hi]) and
    TO_BINARY/TRY_TO_BINARY (HEX/BASE64/UTF-8; NULL on garbage under
    TRY_). The md5-derived generator is engine-portable, so UNIFORM is
    value-checked exactly -- not just distribution-checked."""
    bc = _ctx(spark, sf, events_sf="events")
    return bc.sql("""
        WITH t AS (
          SELECT event_id AS id, event_type,
                 substr(md5(CAST(event_id AS STRING)), 1, 8) AS h
          FROM events_sf WHERE event_id < 2000)
        SELECT id,
               UNIFORM_SF(0, 9, id) AS u_int,
               UNIFORM_SF(100, 199, id + 7) AS u_shift,
               round(UNIFORM_FLOAT(0.0, 1.0, id), 10) AS u_flt,
               hex(TRY_TO_BINARY(h, 'HEX')) AS b_hex,
               hex(TRY_TO_BINARY(CASE WHEN id % 7 = 0 THEN 'zz!'
                                      ELSE h END, 'HEX')) AS b_bad,
               hex(TO_BINARY(event_type, 'UTF-8')) AS b_utf,
               hex(TRY_TO_BINARY(base64(encode(event_type, 'UTF-8')),
                                 'BASE64')) AS b_b64
        FROM t ORDER BY id
    """).spark


_UNIFORM_BINARY_SQL = """
WITH t AS (
  SELECT event_id AS id, event_type,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS h
  FROM events WHERE event_id < 2000)
SELECT id,
  0 + CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 10 AS u_int,
  100 + CAST(concat('0x', substr(md5(CAST(id + 7 AS VARCHAR)), 1, 8))
             AS BIGINT) % 100 AS u_shift,
  round(CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0, 10) AS u_flt,
  upper(h) AS b_hex,
  CASE WHEN id % 7 = 0 THEN NULL ELSE upper(h) END AS b_bad,
  upper(hex(encode(event_type))) AS b_utf,
  upper(hex(from_base64(to_base64(encode(event_type))))) AS b_b64
FROM t ORDER BY id
"""


QUERIES: dict[str, QueryDef] = {
    "sql_uniform_binary_funcs": QueryDef(sql_uniform_binary_funcs,
                                         _UNIFORM_BINARY_SQL),
    "sql_numeric_format_funcs": QueryDef(sql_numeric_format_funcs,
                                         _NUMERIC_FORMAT_SQL),
    "sql_generator_rowcount": QueryDef(sql_generator_rowcount,
                                       _GENERATOR_SQL),
    "dt_numeric_scaling": QueryDef(dt_numeric_scaling,
                                   _DT_NUMERIC_SCALING_SQL),
    "sql_variant_native": QueryDef(sql_variant_native, _VARIANT_NATIVE_SQL),
    "sql_dialect_phase6_funcs": QueryDef(sql_dialect_phase6_funcs,
                                         _DIALECT_PHASE6_SQL),
    "sql_array_multiset_funcs": QueryDef(sql_array_multiset_funcs,
                                         _ARRAY_MULTISET_SQL),
    "dt_daynum_tz_funcs": QueryDef(dt_daynum_tz_funcs, _DAYNUM_TZ_SQL),
    "sql_dialect_tail_funcs": QueryDef(sql_dialect_tail_funcs,
                                       _DIALECT_TAIL_SQL),
    "sql_array_kernel_funcs": QueryDef(sql_array_kernel_funcs,
                                       _ARRAY_KERNEL_SQL),
    "sql_str_kernels2": QueryDef(sql_str_kernels2, _STR_KERNELS2_SQL),
    "sql_format_conv_funcs": QueryDef(sql_format_conv_funcs,
                                      _FORMAT_CONV_SQL),
    "sql_bool_bit_funcs": QueryDef(sql_bool_bit_funcs, _BOOL_BIT_SQL),
    "sql_object_construct_funcs": QueryDef(sql_object_construct_funcs,
                                           _OBJECT_CONSTRUCT_SQL),
    "sql_conversion_funcs": QueryDef(sql_conversion_funcs, _CONVERSION_SQL),
    "sql_time_tochar_funcs": QueryDef(sql_time_tochar_funcs,
                                      _TIME_TOCHAR_SQL),
    "dt_iso_week_funcs": QueryDef(dt_iso_week_funcs, _ISO_WEEK_SQL),
    "dt_time_slice_tz": QueryDef(dt_time_slice_tz, _TIME_SLICE_SQL),
    "str_jaro_winkler": QueryDef(str_jaro_winkler, _JARO_WINKLER_SQL),
    "str_parse_url": QueryDef(str_parse_url, _PARSE_URL_SQL),
    "sql_flatten_lateral": QueryDef(sql_flatten_lateral, _FLATTEN_SQL),
    "sql_flatten_object": QueryDef(sql_flatten_object, _FLATTEN_OBJ_SQL),
    "sql_regexp_funcs": QueryDef(sql_regexp_funcs, _REGEXP_SQL),
    "sql_object_funcs": QueryDef(sql_object_funcs, _OBJECT_SQL),
    "dt_interval_diff_funcs": QueryDef(
        dt_interval_diff_funcs, _INTERVAL_DIFF_SQL),
}
