"""Scalar-function battery (SURVEY.md 2.8): numeric / trig / bitwise /
conditional / casting / JSON kernels (reference BodoSQL kernels:
numeric_array_kernels.py 2474 LoC, trig_array_kernels.py,
other_array_kernels.py, json_array_kernels.py, crypto_funcs.py).

Float-fuzzy functions (trig/exp/log) are aggregated and rounded so
libm-vs-JVM low-bit differences cannot flip the value hash; everything
else is exact (integer, decimal, or identical single double ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, bint, dec, tbl


def math_basic(spark: SparkSession, sf: str) -> DataFrame:
    """abs/sign/ceil/floor/round/mod/greatest/least -- exact ops."""
    e = tbl(spark, sf, "events")
    x = F.col("value") - 50.0
    return e.select(
        "event_id",
        F.abs(x).alias("abs_x"),
        F.signum(x).alias("sign_x"),
        bint(F.ceil(x)).alias("ceil_x"),
        bint(F.floor(x)).alias("floor_x"),
        # integer rounding only: fractional rounding of 2-decimal doubles
        # differs across engines at .x5 (binary-value vs decimal ties)
        bint(F.round(x, 0)).alias("round0_x"),
        (F.col("event_id") % 7).alias("mod7"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("hi"),
        F.least(F.col("value"), F.lit(50.0)).alias("lo"),
    )


_MATH_BASIC_SQL = """
SELECT event_id,
       abs(value - 50.0) AS abs_x,
       CASE WHEN value - 50.0 > 0 THEN 1.0
            WHEN value - 50.0 < 0 THEN -1.0 ELSE 0.0 END AS sign_x,
       CAST(ceil(value - 50.0) AS BIGINT) AS ceil_x,
       CAST(floor(value - 50.0) AS BIGINT) AS floor_x,
       CAST(round(value - 50.0, 0) AS BIGINT) AS round0_x,
       event_id % 7 AS mod7,
       greatest(value, 50.0) AS hi,
       least(value, 50.0) AS lo
FROM events
"""


def math_transcendental(spark: SparkSession, sf: str) -> DataFrame:
    """sqrt/cbrt/exp/ln/log10/log2/pow -- aggregated + rounded (libm
    low-bit divergence guard)."""
    e = tbl(spark, sf, "events")
    v = F.col("value") + 1.0
    return e.groupBy("event_type").agg(
        F.round(F.avg(F.sqrt(v)), 6).alias("avg_sqrt"),
        F.round(F.avg(F.cbrt(v)), 6).alias("avg_cbrt"),
        F.round(F.avg(F.log(v)), 6).alias("avg_ln"),
        F.round(F.avg(F.log10(v)), 6).alias("avg_log10"),
        F.round(F.avg(F.log2(v)), 6).alias("avg_log2"),
        F.round(F.avg(F.pow(v, 1.5)), 4).alias("avg_pow15"),
    ).orderBy("event_type")


_MATH_TRANS_SQL = """
SELECT event_type,
       round(avg(sqrt(value + 1.0)), 6) AS avg_sqrt,
       round(avg(cbrt(value + 1.0)), 6) AS avg_cbrt,
       round(avg(ln(value + 1.0)), 6) AS avg_ln,
       round(avg(log10(value + 1.0)), 6) AS avg_log10,
       round(avg(log2(value + 1.0)), 6) AS avg_log2,
       round(avg(pow(value + 1.0, 1.5)), 4) AS avg_pow15
FROM events GROUP BY event_type ORDER BY event_type
"""


def math_trig(spark: SparkSession, sf: str) -> DataFrame:
    """trig family -- aggregated + rounded."""
    e = tbl(spark, sf, "events")
    v = F.col("value") / 100.0
    return e.groupBy("event_type").agg(
        F.round(F.avg(F.sin(v)), 6).alias("avg_sin"),
        F.round(F.avg(F.cos(v)), 6).alias("avg_cos"),
        F.round(F.avg(F.tan(v)), 6).alias("avg_tan"),
        F.round(F.avg(F.atan2(v, F.lit(1.0))), 6).alias("avg_atan2"),
        F.round(F.avg(F.degrees(v)), 6).alias("avg_deg"),
        F.round(F.avg(F.radians(v)), 8).alias("avg_rad"),
    ).orderBy("event_type")


_MATH_TRIG_SQL = """
SELECT event_type,
       round(avg(sin(value / 100.0)), 6) AS avg_sin,
       round(avg(cos(value / 100.0)), 6) AS avg_cos,
       round(avg(tan(value / 100.0)), 6) AS avg_tan,
       round(avg(atan2(value / 100.0, 1.0)), 6) AS avg_atan2,
       round(avg(degrees(value / 100.0)), 6) AS avg_deg,
       round(avg(radians(value / 100.0)), 8) AS avg_rad
FROM events GROUP BY event_type ORDER BY event_type
"""


def math_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    """bit and/or/xor/not/shift (reference bitX_agg + bitwise kernels)."""
    e = tbl(spark, sf, "events")
    k = F.col("event_id")
    return e.agg(
        F.sum(k.bitwiseAND(F.lit(255))).alias("sum_and"),
        F.sum(k.bitwiseOR(F.lit(16))).alias("sum_or"),
        F.sum(k.bitwiseXOR(F.lit(85))).alias("sum_xor"),
        F.sum(F.shiftleft(k % 1000, 2)).alias("sum_shl"),
        F.sum(F.shiftright(k, 3)).alias("sum_shr"),
        F.bit_and(k % 4096).alias("agg_bit_and"),
        F.bit_or(k % 4096).alias("agg_bit_or"),
        F.bit_xor(k % 4096).alias("agg_bit_xor"),
    )


_MATH_BIT_SQL = """
SELECT CAST(SUM(event_id & 255) AS BIGINT) AS sum_and,
       CAST(SUM(event_id | 16) AS BIGINT) AS sum_or,
       CAST(SUM(xor(event_id, 85)) AS BIGINT) AS sum_xor,
       CAST(SUM((event_id % 1000) << 2) AS BIGINT) AS sum_shl,
       CAST(SUM(event_id >> 3) AS BIGINT) AS sum_shr,
       bit_and(event_id % 4096) AS agg_bit_and,
       bit_or(event_id % 4096) AS agg_bit_or,
       bit_xor(event_id % 4096) AS agg_bit_xor
FROM events
"""


def cond_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """IFF/NVL2/DIV0/NULLIF/COALESCE/CASE (reference other_array_kernels:
    cond, nvl2, equal_null, div0 -> Snowflake semantics)."""
    e = tbl(spark, sf, "events")
    den = F.col("value") - 50.0  # hits 0.0 for value == 50.00
    nullable = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        F.when(F.col("value") > 50, "hi").otherwise("lo").alias("iff"),
        F.when(nullable.isNotNull(), F.lit("has")).otherwise(F.lit("null"))
        .alias("nvl2"),
        F.coalesce(nullable, F.lit("fallback")).alias("coal"),
        # DIV0: x/y but 0 when y = 0 (Snowflake div0 kernel)
        F.coalesce(F.try_divide(F.lit(100.0), den), F.lit(0.0)).alias("div0"),
        nullable.alias("nullif_err"),
    )


_COND_SQL = """
SELECT event_id,
       CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS iff,
       CASE WHEN nullif(event_type, 'error') IS NOT NULL
            THEN 'has' ELSE 'null' END AS nvl2,
       coalesce(nullif(event_type, 'error'), 'fallback') AS coal,
       CASE WHEN value - 50.0 = 0.0 THEN 0.0
            ELSE 100.0 / (value - 50.0) END AS div0,
       nullif(event_type, 'error') AS nullif_err
FROM events
"""


def cast_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """cast / try_cast matrix (reference casting_array_kernels,
    snowflake_conversion_array_kernels: TO_*/TRY_TO_*)."""
    e = tbl(spark, sf, "events")
    return e.select(
        "event_id",
        F.col("value").cast("int").alias("v_int"),
        F.col("value").cast("string").alias("v_str"),
        F.col("event_id").cast("double").alias("id_dbl"),
        F.try_to_number(F.lit("12.50"), F.lit("99.99")).cast("double")
        .alias("parsed_num"),
        F.expr("try_cast(event_type AS DOUBLE)").alias("bad_cast"),
        F.expr("try_cast('7' AS DOUBLE)").alias("good_cast"),
    )


_CAST_SQL = """
SELECT event_id,
       CAST(trunc(value) AS INTEGER) AS v_int,
       CAST(value AS VARCHAR) AS v_str,
       CAST(event_id AS DOUBLE) AS id_dbl,
       CAST(12.50 AS DOUBLE) AS parsed_num,
       TRY_CAST(event_type AS DOUBLE) AS bad_cast,
       TRY_CAST('7' AS DOUBLE) AS good_cast
FROM events
"""


def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction (reference json_array_kernels.py:
    json_extract_path_text, get_path): events.props is a JSON string."""
    e = tbl(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"))
        .orderBy("event_type"))


_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def json_typed_struct(spark: SparkSession, sf: str) -> DataFrame:
    """from_json into a typed struct + field access (reference VARIANT /
    semi-structured ops, variant_array_kernels.py)."""
    e = tbl(spark, sf, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (parsed.getField("k") * 2 + F.col("event_id")).alias("k2"),
        F.to_json(F.struct(F.col("event_id").alias("id"),
                           parsed.getField("k").alias("k"))).alias("rejson"),
    )


_JSON_STRUCT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 + event_id AS k2,
       '{"id":' || event_id || ',"k":'
         || json_extract_string(props, '$.k') || '}' AS rejson
FROM events
"""


def array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """array_* kernels (reference nested_data_kernels.py): construct,
    size, contains, position, slice, sort, distinct, intersect/except,
    aggregate over array."""
    p = tbl(spark, sf, "part")
    words = F.split("p_name", " ")
    fixed = F.array(F.lit("red"), F.lit("blue"), F.lit("gear"))
    return p.select(
        "p_partkey",
        bint(F.size(words)).alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
        bint(F.array_position(words, "widget")).alias("pos_widget"),
        F.array_join(F.array_sort(words), "+").alias("sorted_words"),
        F.array_join(F.array_sort(F.array_intersect(words, fixed)), ",")
        .alias("common"),
        F.array_join(F.array_except(words, fixed), ",").alias("minus"),
        bint(F.size(F.array_distinct(F.concat(words, words))))
        .alias("n_distinct"),
    )


_ARRAY_SQL = """
SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_words,
       list_contains(string_split(p_name, ' '), 'red') AS has_red,
       coalesce(list_position(string_split(p_name, ' '), 'widget'), 0) AS pos_widget,
       coalesce(list_aggregate(list_sort(string_split(p_name, ' ')),
                               'string_agg', '+'), '') AS sorted_words,
       coalesce(list_aggregate(list_sort(list_intersect(string_split(p_name, ' '),
                                     ['red','blue','gear'])), 'string_agg', ','), '') AS common,
       coalesce(list_aggregate(list_filter(string_split(p_name, ' '),
                                  x -> NOT list_contains(['red','blue','gear'], x)),
                      'string_agg', ','), '') AS minus,
       len(list_distinct(list_concat(string_split(p_name, ' '),
                                     string_split(p_name, ' ')))) AS n_distinct
FROM part
"""


def map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """map/object kernels (reference variadic_array_kernels.py:
    object_construct, object_keys; semi-structured access)."""
    e = tbl(spark, sf, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"))
    return e.select(
        "event_id",
        m.getItem("type").alias("m_type"),
        m.getItem("uid").alias("m_uid"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
        bint(F.size(m)).alias("m_size"),
    )


_MAP_SQL = """
SELECT event_id,
       event_type AS m_type,
       CAST(user_id AS VARCHAR) AS m_uid,
       'type,uid' AS keys,
       2 AS m_size
FROM events
"""


def sql_snowflake_dialect(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake-dialect functions through the engine's SQL context
    (IFF/DIV0/SQUARE/EDITDISTANCE/STRTOK shims as inlined SQL UDFs)."""
    from ..sql import BodoSQLContext
    bc = BodoSQLContext({"events_sf": tbl(spark, sf, "events")}, spark=spark)
    return bc.sql("""
        SELECT event_type,
               SUM(CAST(IFF(value > 50.0, 1.0, 0.0) AS BIGINT)) AS n_hi,
               round(AVG(DIV0(100.0, value - 50.0)), 4) AS avg_div0,
               SUM(CAST(SQUARE(CAST(event_id % 10 AS DOUBLE)) AS BIGINT)) AS sq_sum,
               MIN(EDITDISTANCE(event_type, 'click')) AS ed,
               MIN(STRTOK('a,b,c', ',', 2)) AS tok
        FROM events_sf
        GROUP BY event_type ORDER BY event_type
    """).spark


_SQL_SNOWFLAKE_SQL = """
SELECT event_type,
       CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       round(AVG(CASE WHEN value - 50.0 = 0 THEN 0
                      ELSE 100.0 / (value - 50.0) END), 4) AS avg_div0,
       CAST(SUM(CAST((event_id % 10) * (event_id % 10) AS BIGINT)) AS BIGINT) AS sq_sum,
       MIN(levenshtein(event_type, 'click')) AS ed,
       MIN('b') AS tok
FROM events GROUP BY event_type ORDER BY event_type
"""


def math_numeric_tail(spark: SparkSession, sf: str) -> DataFrame:
    """Numeric kernel tail (reference numeric_array_kernels.py conv/
    getbit/width_bucket/factorial + TIMESTAMP_TZ_FROM_PARTS): base
    conversion, single-bit extraction, histogram bucketing and exact
    factorials as Spark builtins, bucketed and summed for a stable
    oracle."""
    e = tbl(spark, sf, "events").where(F.col("event_id") < 5000)
    k = F.col("event_id")
    return (e.select(
        k.alias("id"),
        F.conv(k.cast("string"), 10, 16).alias("hex16"),
        F.getbit(k, F.lit(3)).alias("b3"),
        F.width_bucket(F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(8))
         .alias("wb"),
        F.factorial((k % 15).cast("int")).alias("fact"))
        .orderBy("id"))


_MATH_TAIL_SQL = """
SELECT event_id AS id,
       upper(to_hex(event_id)) AS hex16,
       CAST((event_id >> 3) & 1 AS INT) AS b3,
       CAST(CASE WHEN value < 0 THEN 0
                 WHEN value >= 100 THEN 9
                 ELSE floor(value * 8 / 100) + 1 END AS BIGINT) AS wb,
       CAST(factorial(CAST(event_id % 15 AS INT)) AS BIGINT) AS fact
FROM events WHERE event_id < 5000 ORDER BY id
"""


QUERIES: dict[str, QueryDef] = {
    "math_numeric_tail": QueryDef(math_numeric_tail, _MATH_TAIL_SQL),
    "sql_snowflake_dialect": QueryDef(sql_snowflake_dialect, _SQL_SNOWFLAKE_SQL),
    "math_basic": QueryDef(math_basic, _MATH_BASIC_SQL),
    "math_transcendental": QueryDef(math_transcendental, _MATH_TRANS_SQL),
    "math_trig": QueryDef(math_trig, _MATH_TRIG_SQL),
    "math_bitwise": QueryDef(math_bitwise, _MATH_BIT_SQL),
    "cond_funcs": QueryDef(cond_funcs, _COND_SQL),
    "cast_funcs": QueryDef(cast_funcs, _CAST_SQL),
    "json_extract": QueryDef(json_extract, _JSON_EXTRACT_SQL),
    "json_typed_struct": QueryDef(json_typed_struct, _JSON_STRUCT_SQL),
    "array_funcs": QueryDef(array_funcs, _ARRAY_SQL),
    "map_funcs": QueryDef(map_funcs, _MAP_SQL),
}
