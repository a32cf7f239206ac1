"""Snowflake-dialect function kernels.

Reference surface: BodoSQL/bodosql/kernels/ (string_array_kernels.py,
datetime_array_kernels.py, snowflake_conversion_array_kernels.py,
lateral.py). Re-expressed Spark-first:

- SQL-expressible kernels are CREATE TEMPORARY FUNCTION bodies --
  Catalyst inlines them into the calling plan, so they cost the same
  as writing the expression by hand (verified: no extra project node,
  stays in WholeStageCodegen).
- JAROWINKLER_SIMILARITY is a real Jaro-Winkler (prefix<=4, p=0.1,
  boost threshold 0.7 -- the standard parameters, matching DuckDB's
  jaro_winkler_similarity bit-for-bit on doubles) as an Arrow-batched
  pandas UDF; the previous levenshtein-ratio stand-in answered wrong
  values under a real metric's name.
- LATERAL FLATTEN's 6-output struct (reference kernels/lateral.py:100)
  is the ``flatten`` helper: posexplode + computed path columns.

NOTE Spark resolves builtins before temp functions, so Snowflake names
whose Spark builtin differs in arity/semantics (TO_NUMBER, TO_VARCHAR,
CONVERT_TIMEZONE -- Spark 4's convert_timezone already has Snowflake's
argument shape) are NOT shimmed; callers use the builtin or CAST.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# SQL-UDF kernel bodies (inlined by Catalyst)
# ---------------------------------------------------------------------------

_BOOL_TRUE = "'true','t','yes','y','on','1'"
_BOOL_FALSE = "'false','f','no','n','off','0'"

_TIME_SLICE_UNIT = ("CASE upper(unit) WHEN 'SECOND' THEN 1 "
                    "WHEN 'MINUTE' THEN 60 WHEN 'HOUR' THEN 3600 "
                    "WHEN 'DAY' THEN 86400 END")

SNOWFLAKE_SQL_FNS: dict[str, str] = {
    # conditionals
    "IFF": "(c BOOLEAN, a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN CASE WHEN c THEN a ELSE b END",
    "DIV0": "(x DOUBLE, y DOUBLE) RETURNS DOUBLE RETURN CASE WHEN y = 0 THEN 0 ELSE x / y END",
    "DIV0NULL": "(x DOUBLE, y DOUBLE) RETURNS DOUBLE RETURN CASE WHEN y = 0 OR y IS NULL THEN 0 ELSE x / y END",
    # numeric
    "SQUARE": "(x DOUBLE) RETURNS DOUBLE RETURN x * x",
    "SQUARE_ROOT": "(x DOUBLE) RETURNS DOUBLE RETURN sqrt(x)",
    # strings
    "EDITDISTANCE": "(a STRING, b STRING) RETURNS INT RETURN levenshtein(a, b)",
    "STRTOK": "(s STRING, delim STRING, part INT) RETURNS STRING RETURN split_part(s, delim, part)",
    "SPLIT_TO_ARRAY": "(s STRING, delim STRING) RETURNS ARRAY<STRING> RETURN split(s, delim)",
    # conversion (reference snowflake_conversion_array_kernels.py):
    # TO_* raise on malformed input (Spark ANSI cast), TRY_TO_* yield NULL
    "TO_DOUBLE": "(s STRING) RETURNS DOUBLE RETURN CAST(s AS DOUBLE)",
    "TRY_TO_DOUBLE": "(s STRING) RETURNS DOUBLE RETURN TRY_CAST(s AS DOUBLE)",
    "TRY_TO_DECIMAL": "(s STRING) RETURNS DECIMAL(38,0) RETURN TRY_CAST(s AS DECIMAL(38,0))",
    "TO_BOOLEAN": (
        "(s STRING) RETURNS BOOLEAN RETURN CASE "
        f"WHEN lower(trim(s)) IN ({_BOOL_TRUE}) THEN true "
        f"WHEN lower(trim(s)) IN ({_BOOL_FALSE}) THEN false "
        "WHEN s IS NULL THEN NULL "
        "ELSE raise_error(concat('Boolean value ''', s, ''' is not recognized')) END"),
    "TRY_TO_BOOLEAN": (
        "(s STRING) RETURNS BOOLEAN RETURN CASE "
        f"WHEN lower(trim(s)) IN ({_BOOL_TRUE}) THEN true "
        f"WHEN lower(trim(s)) IN ({_BOOL_FALSE}) THEN false "
        "ELSE NULL END"),
    # datetime (reference datetime_array_kernels.py): ISO-week family.
    # Spark weekofyear IS the ISO week; ISO day-of-week from Sunday=1
    # dayofweek; ISO year = calendar year of the Thursday of ts's week.
    "DAYOFWEEKISO": "(d DATE) RETURNS INT RETURN pmod(dayofweek(d) + 5, 7) + 1",
    "WEEKISO": "(d DATE) RETURNS INT RETURN weekofyear(d)",
    "YEAROFWEEKISO": (
        "(d DATE) RETURNS INT RETURN "
        "year(date_add(d, 4 - (pmod(dayofweek(d) + 5, 7) + 1)))"),
    "TIME_SLICE": (
        "(ts TIMESTAMP, n INT, unit STRING) RETURNS TIMESTAMP RETURN "
        f"timestamp_seconds(floor(unix_timestamp(ts) / (n * ({_TIME_SLICE_UNIT})))"
        f" * n * ({_TIME_SLICE_UNIT}))"),
    "DATE_FROM_PARTS": "(y INT, m INT, d INT) RETURNS DATE RETURN make_date(y, m, d)",
    "TIME_FROM_PARTS": "(h INT, m INT, s INT) RETURNS TIMESTAMP RETURN make_timestamp(1970, 1, 1, h, m, s)",
    # semi-structured
    "CONDITIONAL_TRUE_EVENT_PREP": "(c BOOLEAN) RETURNS INT RETURN CASE WHEN c THEN 1 ELSE 0 END",
}


# ---------------------------------------------------------------------------
# Phase 3: string long tail (reference string_array_kernels.py insert,
# strtok_to_array, rtrimmed_length, strcmp, contains, position, hex/base64
# codecs, uuid5), variadic object construction with Snowflake null
# semantics (variadic_array_kernels.py object_construct[_keep_null]),
# variant predicates (variant_array_kernels.py is_array/is_object), and
# boolean/numeric kernels (other_array_kernels.py booland/boolor/boolxor/
# nvl2/equal_null/regr_valx, numeric_array_kernels.py getbit/bitand/
# haversine, datetime_array_kernels.py dayname/monthname/weekday/makedate).
# All pure SQL-UDF bodies -> Catalyst inlines them, zero Python.
# ---------------------------------------------------------------------------

def _obj_construct(n: int, keep_null: bool) -> tuple[str, str]:
    """OBJECT_CONSTRUCT{n} / OBJECT_CONSTRUCT_KEEP_NULL{n}: SQL UDFs are
    fixed-arity, so the variadic reference kernel lands as one shim per
    arity. Snowflake drops pairs whose VALUE is null; KEEP_NULL keeps."""
    args = ", ".join(f"k{i} STRING, v{i} STRING" for i in range(1, n + 1))
    entries = ", ".join(
        f"struct(k{i} AS key, v{i} AS value)" for i in range(1, n + 1))
    name = f"OBJECT_CONSTRUCT_KEEP_NULL{n}" if keep_null \
        else f"OBJECT_CONSTRUCT{n}"
    pred = "e.key IS NOT NULL" if keep_null \
        else "e.key IS NOT NULL AND e.value IS NOT NULL"
    body = (f"({args}) RETURNS MAP<STRING,STRING> RETURN "
            f"map_from_entries(filter(array({entries}), e -> {pred}))")
    return name, body


SNOWFLAKE_SQL_FNS.update(
    dict(_obj_construct(n, kn) for n in (1, 2, 3, 4, 5, 6)
         for kn in (False, True)))


def _obj_keyset(name: str, n: int, keep_matching: bool) -> tuple[str, str]:
    """OBJECT_DELETE{n} / OBJECT_PICK{n}: drop or keep the listed keys
    (reference variadic OBJECT_DELETE/OBJECT_PICK; fixed-arity shims)."""
    args = ", ".join(f"k{i} STRING" for i in range(1, n + 1))
    arr = "array({})".format(", ".join(f"k{i}" for i in range(1, n + 1)))
    pred = f"array_contains({arr}, k)"
    if not keep_matching:
        pred = f"NOT {pred}"
    body = (f"(m MAP<STRING,STRING>, {args}) RETURNS MAP<STRING,STRING> "
            f"RETURN map_filter(m, (k, v) -> {pred})")
    return f"{name}{n}", body


SNOWFLAKE_SQL_FNS.update(dict(
    [_obj_keyset("OBJECT_DELETE", n, False) for n in (3, 4)]
    + [_obj_keyset("OBJECT_PICK", n, True) for n in (3, 4)]))

# Snowflake format string -> Java DateTimeFormatter pattern, as a replace
# chain (reference snowflake_conversion_array_kernels.py
# convert_snowflake_date_format_str_to_py_format). Replacement ORDER is
# load-bearing: longest/ambiguous tokens first, and SS before FF3 so the
# emitted 'SSS' (millis) is not re-rewritten.
_SF_FMT_TOKENS = [
    # MMMM passes through untouched (Java MMMM = full month name);
    # DAY must precede DY in the chain table for reader clarity though
    # 'DAY' contains no 'DY' substring
    ("YYYY", "yyyy"), ("YY", "yy"), ("MON", "MMM"),
    ("DAY", "EEEE"), ("DY", "EEE"),
    ("DD", "dd"), ("HH24", "HH"), ("HH12", "hh"), ("AM", "a"), ("PM", "a"),
    ("MI", "mm"), ("SS", "ss"), ("FF3", "SSS"), ("FF", "SSSSSS"),
]
_SF_FMT_CHAIN = "fmt"
for _sf, _java in _SF_FMT_TOKENS:
    _SF_FMT_CHAIN = f"replace({_SF_FMT_CHAIN}, '{_sf}', '{_java}')"

SNOWFLAKE_SQL_FNS.update({
    # -- strings
    "INSERT4": (
        "(s STRING, pos INT, len INT, repl STRING) RETURNS STRING RETURN "
        "concat(substr(s, 1, pos - 1), repl, substr(s, pos + len))"),
    "STRTOK_TO_ARRAY": (
        "(s STRING, delims STRING) RETURNS ARRAY<STRING> RETURN "
        # split on ANY delimiter character ([\Q..\E] = regex-quoted set),
        # dropping empty tokens (Snowflake strtok semantics)
        "filter(split(s, concat('[\\\\Q', delims, '\\\\E]')), x -> x <> '')"),
    "RTRIMMED_LENGTH": "(s STRING) RETURNS INT RETURN length(rtrim(s))",
    "STRCMP": ("(a STRING, b STRING) RETURNS INT RETURN "
               "CASE WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END"),
    "CONTAINS_STR": ("(s STRING, sub STRING) RETURNS BOOLEAN RETURN "
                     "instr(s, sub) > 0"),
    "POSITION3": (
        "(sub STRING, s STRING, pos INT) RETURNS INT RETURN "
        "CASE WHEN instr(substr(s, pos), sub) = 0 THEN 0 "
        "ELSE instr(substr(s, pos), sub) + pos - 1 END"),
    "HEX_ENCODE": ("(s STRING) RETURNS STRING RETURN "
                   "upper(hex(encode(s, 'UTF-8')))"),
    "HEX_DECODE_STRING": ("(s STRING) RETURNS STRING RETURN "
                          "decode(unhex(s), 'UTF-8')"),
    "BASE64_ENCODE": ("(s STRING) RETURNS STRING RETURN "
                      "base64(encode(s, 'UTF-8'))"),
    "BASE64_DECODE_STRING": ("(s STRING) RETURNS STRING RETURN "
                             "decode(unbase64(s), 'UTF-8')"),
    # RFC-4122 v5 (SHA-1 name-based) UUID: hash namespace bytes + name,
    # then patch the version nibble to 5 and the variant nibble to 8..b.
    "UUID5": (
        "(ns STRING, name STRING) RETURNS STRING RETURN "
        "CASE WHEN ns IS NOT NULL AND name IS NOT NULL THEN "
        "concat(substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 1, 8), '-', "
        "substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 9, 4), '-5', "
        "substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 14, 3), '-', "
        "lower(conv(CAST(conv(substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 17, 1), 16, 10) AS INT) % 4 + 8, 10, 16)), "
        "substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 18, 3), '-', "
        "substr(sha1(concat(unhex(replace(ns, '-', '')), "
        "encode(name, 'UTF-8'))), 21, 12)) END"),
    # -- conversion with Snowflake format strings
    "TO_CHAR_TS": (
        "(ts TIMESTAMP, fmt STRING) RETURNS STRING RETURN "
        f"date_format(ts, {_SF_FMT_CHAIN})"),
    "TO_TIMESTAMP_SF": (
        "(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN "
        f"to_timestamp(s, {_SF_FMT_CHAIN})"),
    "TRY_TO_TIMESTAMP_SF": (
        "(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN "
        f"try_to_timestamp(s, {_SF_FMT_CHAIN})"),
    "TO_DATE_SF": (
        "(s STRING, fmt STRING) RETURNS DATE RETURN "
        f"to_date(s, {_SF_FMT_CHAIN})"),
    "TRY_TO_DATE_SF": (
        "(s STRING, fmt STRING) RETURNS DATE RETURN "
        f"CAST(try_to_timestamp(s, {_SF_FMT_CHAIN}) AS DATE)"),
    # TO_BINARY / TRY_TO_BINARY: NOT shimmed -- Spark's builtins already
    # have Snowflake's exact (s, 'HEX'|'BASE64'|'UTF-8') semantics and
    # builtins shadow temp functions (see module NOTE).
    # -- variant predicates over JSON text
    "IS_ARRAY_JSON": ("(js STRING) RETURNS BOOLEAN RETURN "
                      "ltrim(js) LIKE '[%'"),
    "IS_OBJECT_JSON": ("(js STRING) RETURNS BOOLEAN RETURN "
                       "ltrim(js) LIKE '{%'"),
    "JSON_EXTRACT_PATH_TEXT": (
        "(js STRING, path STRING) RETURNS STRING RETURN "
        "get_json_object(js, concat('$.', path))"),
    # PARSE_JSON for flat objects (reference json_array_kernels.py
    # parse_single_json_map): the VARIANT-as-map model used throughout
    # the object kernels.
    "PARSE_JSON_MAP": (
        "(js STRING) RETURNS MAP<STRING,STRING> RETURN "
        "from_json(js, 'map<string,string>')"),
    # -- booleans (Snowflake 3VL over numeric args: nonzero = true; SQL
    # AND/OR give exactly the documented NULL behavior, e.g.
    # BOOLAND(0, NULL) = FALSE but BOOLAND(1, NULL) = NULL)
    "BOOLAND": ("(a DOUBLE, b DOUBLE) RETURNS BOOLEAN RETURN "
                "(a <> 0) AND (b <> 0)"),
    "BOOLOR": ("(a DOUBLE, b DOUBLE) RETURNS BOOLEAN RETURN "
               "(a <> 0) OR (b <> 0)"),
    "BOOLXOR": ("(a DOUBLE, b DOUBLE) RETURNS BOOLEAN RETURN "
                "(a <> 0) <> (b <> 0)"),
    "BOOLNOT": "(a DOUBLE) RETURNS BOOLEAN RETURN NOT (a <> 0)",
    # NVL2 / EQUAL_NULL / GETBIT / DAYNAME / MONTHNAME / WEEKDAY: NOT
    # shimmed -- Spark 4 builtins with Snowflake-identical semantics
    # already shadow these names (see module NOTE).
    "NOT_EQUAL_NULL": ("(a STRING, b STRING) RETURNS BOOLEAN RETURN "
                       "NOT (a <=> b)"),
    "REGR_VALX": ("(y DOUBLE, x DOUBLE) RETURNS DOUBLE RETURN "
                  "CASE WHEN y IS NOT NULL THEN x END"),
    "REGR_VALY": ("(y DOUBLE, x DOUBLE) RETURNS DOUBLE RETURN "
                  "CASE WHEN x IS NOT NULL THEN y END"),
    # -- numeric
    "BITAND": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a & b",
    "BITOR": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a | b",
    "BITXOR": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a ^ b",
    "BITNOT": "(a BIGINT) RETURNS BIGINT RETURN ~a",
    "BITSHIFTLEFT": "(a BIGINT, n INT) RETURNS BIGINT RETURN a << n",
    "BITSHIFTRIGHT": "(a BIGINT, n INT) RETURNS BIGINT RETURN a >> n",
    "HAVERSINE": (
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) "
        "RETURNS DOUBLE RETURN "
        "2 * 6371 * asin(sqrt(pow(sin(radians(lat2 - lat1) / 2), 2) "
        "+ cos(radians(lat1)) * cos(radians(lat2)) "
        "* pow(sin(radians(lon2 - lon1) / 2), 2)))"),
    # -- datetime naming/parts
    "MAKEDATE": ("(y INT, doy INT) RETURNS DATE RETURN "
                 "date_add(make_date(y, 1, 1), doy - 1)"),
    # Spark 4 natively covers many further Snowflake names -- DECODE
    # (key-match form), ZEROIFNULL, NULLIFZERO, RANDSTR, LEN, SPLIT_PART,
    # SUBSTRING_INDEX, TRANSLATE, SOUNDEX, CHAR, ASCII -- not shimmed.
    # LAST_DAY with a unit argument (reference datetime kernels
    # last_day_month/quarter/week/year; Spark's builtin covers month only)
    "LAST_DAY_UNIT": (
        "(d DATE, unit STRING) RETURNS DATE RETURN "
        "CASE upper(unit) "
        "WHEN 'MONTH' THEN last_day(d) "
        "WHEN 'QUARTER' THEN date_sub(add_months(CAST(date_trunc('QUARTER', d) AS DATE), 3), 1) "
        "WHEN 'YEAR' THEN make_date(year(d), 12, 31) "
        "WHEN 'WEEK' THEN date_add(CAST(date_trunc('WEEK', d) AS DATE), 6) "
        "END"),
    # editdistance_with_max (reference string kernels): Spark's 3-arg
    # levenshtein(threshold) returns -1 past the bound; Snowflake clamps.
    "EDITDISTANCE3": (
        "(a STRING, b STRING, mx INT) RETURNS INT RETURN "
        "CASE WHEN levenshtein(a, b, mx) < 0 THEN mx "
        "ELSE levenshtein(a, b, mx) END"),
    "CHARINDEX": (
        "(sub STRING, s STRING, pos INT) RETURNS INT RETURN "
        "CASE WHEN instr(substr(s, pos), sub) = 0 THEN 0 "
        "ELSE instr(substr(s, pos), sub) + pos - 1 END"),
    "UUID_STRING": "() RETURNS STRING RETURN uuid()",
    # UNIFORM(lo, hi, gen) (reference other_array_kernels.py:1075):
    # deterministic per-row generator -- same gen, same output; int
    # domain [lo, hi]. The reference seeds numpy's MT19937 with gen;
    # replicating MT's bit stream in SQL is neither possible nor part
    # of the contract, so the generator here is an md5-derived hash of
    # gen (engine-portable: DuckDB reproduces it exactly, so UNIFORM
    # is oracle-checkable -- stronger than a numpy-seeded twin).
    "UNIFORM_SF": (
        "(lo BIGINT, hi BIGINT, gen BIGINT) RETURNS BIGINT RETURN "
        "lo + pmod(CAST(conv(substr(md5(CAST(gen AS STRING)), 1, 8), "
        "16, 10) AS BIGINT), hi - lo + 1)"),
    "UNIFORM_FLOAT": (
        "(lo DOUBLE, hi DOUBLE, gen BIGINT) RETURNS DOUBLE RETURN "
        "lo + (CAST(conv(substr(md5(CAST(gen AS STRING)), 1, 8), "
        "16, 10) AS DOUBLE) / 4294967296.0) * (hi - lo)"),
    # TO_BINARY / TRY_TO_BINARY (reference
    # snowflake_conversion_array_kernels.py to_binary): Spark 4 ships
    # BOTH as builtins with Snowflake's exact HEX/BASE64/UTF-8
    # semantics (NULL-on-garbage under TRY_) -- same-name builtin, no
    # shim needed; exercised by q:sql_uniform_binary_funcs.
    "SYSDATE": "() RETURNS TIMESTAMP RETURN current_timestamp()",
    # TO_NUMBER with the common display-format elements (commas, $),
    # HONORING prec/scale like Snowflake: parse, round half-away to
    # ``scale`` (decimal-exact scaled-cast trick: round() needs a
    # foldable scale), then error when the value needs more than
    # prec-scale integer digits. Decimal-typed throughout; returns
    # DECIMAL(38,6) (static UDF return type; scale <= 6 is exact).
    "TO_NUMBER_FMT": (
        "(s STRING, prec INT, scale INT) RETURNS DECIMAL(38,6) RETURN "
        "CASE WHEN TRY_CAST(replace(replace(trim(s), ',', ''), '$', '') "
        "       AS DECIMAL(38,6)) IS NULL THEN "
        "  CASE WHEN s IS NULL THEN NULL "
        "       ELSE CAST(raise_error(concat('Numeric value ', s, "
        "            ' is not recognized')) AS DECIMAL(38,6)) END "
        "WHEN CAST(abs(CAST(TRY_CAST(replace(replace(trim(s), ',', ''), "
        "       '$', '') AS DECIMAL(38,6)) "
        "       * CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) "
        "       AS DECIMAL(38,0))) AS DOUBLE) "
        "     >= power(10, coalesce(prec, 38)) THEN "
        "  CAST(raise_error(concat('Number out of representable range: ', "
        "       s)) AS DECIMAL(38,6)) "
        "ELSE CAST(TRY_CAST(replace(replace(trim(s), ',', ''), '$', "
        "     '') AS DECIMAL(38,6)) "
        "     * CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) "
        "     AS DECIMAL(38,0)) "
        "     / CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) END"),
    # -- array kernels (reference nested_data_kernels.py). Spark builtins
    # cover array_distinct/remove/append/prepend/max/min/size/compact/
    # flatten under the same names and semantics; shims exist where
    # Snowflake differs: 0-based indexing, exclusive ends, reversed
    # argument order, a Snowflake-only name, or MULTISET except/
    # intersection semantics (phase-5 block below -- Spark's
    # array_except/array_intersect dedupe, Snowflake's do not).
    "ARRAY_GENERATE_RANGE": (
        "(a BIGINT, b BIGINT, step BIGINT) RETURNS ARRAY<BIGINT> RETURN "
        # Snowflake's end is EXCLUSIVE; Spark sequence() is inclusive.
        "CASE WHEN step = 0 THEN NULL "
        "WHEN step > 0 AND a >= b THEN array() "
        "WHEN step < 0 AND a <= b THEN array() "
        "WHEN step > 0 THEN sequence(a, a + ((b - 1 - a) DIV step) * step, step) "
        "ELSE sequence(a, a + ((b + 1 - a) DIV step) * step, step) END"),
    "ARRAY_SLICE": (
        "(arr ARRAY<STRING>, f INT, t INT) RETURNS ARRAY<STRING> RETURN "
        # Snowflake: 0-based from (inclusive) to (exclusive)
        "slice(arr, f + 1, greatest(t - f, 0))"),
    "ARRAY_TO_STRING": (
        "(arr ARRAY<STRING>, sep STRING) RETURNS STRING RETURN "
        "array_join(arr, sep, '')"),
    "ARRAYS_TO_OBJECT": (
        "(ks ARRAY<STRING>, vs ARRAY<STRING>) "
        "RETURNS MAP<STRING,STRING> RETURN map_from_arrays(ks, vs)"),
    "ARRAY_POSITION_SF": (
        # Snowflake: (value, array), 0-based, NULL when absent
        "(v STRING, arr ARRAY<STRING>) RETURNS INT RETURN "
        "CASE WHEN array_position(arr, v) = 0 THEN NULL "
        "ELSE CAST(array_position(arr, v) - 1 AS INT) END"),
    "ARRAY_CONTAINS_SF": (
        # Snowflake argument order (value, array)
        "(v STRING, arr ARRAY<STRING>) RETURNS BOOLEAN RETURN "
        "array_contains(arr, v)"),
    "ARRAY_CAT": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN "
        "concat(a, b)"),
})


# ---------------------------------------------------------------------------
# Phase 5: multiset array semantics + positional/sort/object tail.
#
# Snowflake's ARRAY_EXCEPT / ARRAY_INTERSECTION are MULTISET operations
# (reference nested_data_kernels.py overload_array_except_util: each
# element of the second array cancels AT MOST ONE matching element of the
# first, order preserved, NULL matches NULL) -- Spark's builtins
# array_except/array_intersect DEDUPLICATE, so they are not drop-in.
# Multiset form as a pure higher-order-function expression: keep a[i] iff
# the number of occurrences of a[i] in the prefix a[0..i] exceeds (EXCEPT)
# / does not exceed (INTERSECTION) its count in b. <=> gives the
# reference's null-matches-null equality.
# ---------------------------------------------------------------------------

_PREFIX_CNT = "size(filter(slice(a, 1, i + 1), y -> y <=> x))"
_RIGHT_CNT = "size(filter(b, y -> y <=> x))"

SNOWFLAKE_SQL_FNS.update({
    "ARRAY_EXCEPT_SF": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN "
        "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
        f"ELSE filter(a, (x, i) -> {_PREFIX_CNT} > {_RIGHT_CNT}) END"),
    "ARRAY_INTERSECTION_SF": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN "
        "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
        f"ELSE filter(a, (x, i) -> {_PREFIX_CNT} <= {_RIGHT_CNT}) END"),
    # ARRAY_REMOVE_AT: 0-based position, negative counts from the end,
    # out-of-range returns the array unchanged (Snowflake semantics).
    "ARRAY_REMOVE_AT": (
        "(a ARRAY<STRING>, pos INT) RETURNS ARRAY<STRING> RETURN "
        "CASE WHEN a IS NULL OR pos IS NULL THEN NULL "
        "ELSE filter(a, (x, i) -> i != "
        "CASE WHEN pos < 0 THEN size(a) + pos ELSE pos END) END"),
    # ARRAY_SORT with Snowflake's (sort_ascending, nulls_first) flags;
    # Spark's array_sort comparator lambda stays whole-stage codegen.
    "ARRAY_SORT_SF": (
        "(a ARRAY<STRING>, asc BOOLEAN, nf BOOLEAN) "
        "RETURNS ARRAY<STRING> RETURN array_sort(a, (l, r) -> "
        "CASE WHEN l IS NULL AND r IS NULL THEN 0 "
        "WHEN l IS NULL THEN IF(nf, -1, 1) "
        "WHEN r IS NULL THEN IF(nf, 1, -1) "
        "WHEN l < r THEN IF(asc, -1, 1) "
        "WHEN l > r THEN IF(asc, 1, -1) ELSE 0 END)"),
    # GET_IGNORE_CASE over the VARIANT-as-map model (reference
    # other_array_kernels.py get_ignore_case): first value whose key
    # matches case-insensitively; get() is NULL-safe out of bounds.
    "GET_IGNORE_CASE": (
        "(m MAP<STRING,STRING>, k STRING) RETURNS STRING RETURN "
        "get(map_values(map_filter(m, (mk, mv) -> lower(mk) = lower(k))), 0)"),
    # MySQL day-number family (reference datetime_array_kernels.py
    # to_days/from_days/to_seconds): day 0 = year-0 epoch, 719528 days
    # before 1970-01-01; TO_SECONDS is the same epoch in seconds.
    "TO_DAYS": ("(d DATE) RETURNS BIGINT RETURN "
                "CAST(datediff(d, DATE '1970-01-01') AS BIGINT) + 719528"),
    "FROM_DAYS": ("(n BIGINT) RETURNS DATE RETURN "
                  "date_add(DATE '1970-01-01', CAST(n - 719528 AS INT))"),
    "TO_SECONDS": ("(ts TIMESTAMP) RETURNS BIGINT RETURN "
                   # BIGINT literal first: INT*INT would wrap silently
                   "unix_timestamp(ts) + CAST(719528 AS BIGINT) * 86400"),
    # INITCAP with an explicit delimiter set (reference
    # string_array_kernels.py initcap's 2-arg form; Spark's builtin
    # splits on whitespace only): uppercase the first char and any char
    # following a delimiter, lowercase the rest -- a per-char transform
    # over split(s, ''), still a codegen expression.
    "INITCAP2": (
        "(s STRING, delims STRING) RETURNS STRING RETURN "
        "concat_ws('', transform(split(lower(s), ''), (c, i) -> "
        "CASE WHEN i = 0 OR instr(delims, substr(s, i, 1)) > 0 "
        "THEN upper(c) ELSE c END))"),
    # TYPEOF over JSON text (reference variant_array_kernels.py typeof:
    # INTEGER / DECIMAL / DOUBLE / VARCHAR / BOOLEAN / ARRAY / OBJECT /
    # NULL_VALUE classification of a VARIANT).
    "TYPEOF_JSON": (
        "(js STRING) RETURNS STRING RETURN CASE "
        "WHEN js IS NULL THEN NULL "
        "WHEN ltrim(js) LIKE '[%' THEN 'ARRAY' "
        "WHEN ltrim(js) LIKE '{%' THEN 'OBJECT' "
        "WHEN trim(js) = 'null' THEN 'NULL_VALUE' "
        "WHEN trim(js) IN ('true', 'false') THEN 'BOOLEAN' "
        "WHEN trim(js) RLIKE '^-?[0-9]+$' THEN 'INTEGER' "
        "WHEN trim(js) RLIKE '^-?[0-9]*\\\\.[0-9]+$' THEN 'DECIMAL' "
        "WHEN trim(js) RLIKE "
        "'^-?[0-9]*\\\\.?[0-9]+[eE][+-]?[0-9]+$' THEN 'DOUBLE' "
        "ELSE 'VARCHAR' END"),
    # ROUND with Snowflake's rounding-mode argument: HALF_AWAY_FROM_ZERO
    # (the default) vs HALF_TO_EVEN (banker's). Spark's round()/bround()
    # require a FOLDABLE scale, so a UDF parameter can't be passed
    # through -- spelled out over floor() instead (tie = fractional part
    # exactly 0.5 after scaling).
    "ROUND_SF": (
        "(x DOUBLE, s INT, mode STRING) RETURNS DOUBLE RETURN "
        "CASE WHEN x * power(10, s) - floor(x * power(10, s)) > 0.5 "
        "  THEN (floor(x * power(10, s)) + 1) / power(10, s) "
        "WHEN x * power(10, s) - floor(x * power(10, s)) < 0.5 "
        "  THEN floor(x * power(10, s)) / power(10, s) "
        "WHEN upper(mode) = 'HALF_TO_EVEN' "
        "  THEN (floor(x * power(10, s)) "
        "        + CASE WHEN pmod(floor(x * power(10, s)), 2) = 0 "
        "               THEN 0 ELSE 1 END) / power(10, s) "
        "WHEN x < 0 THEN floor(x * power(10, s)) / power(10, s) "
        "ELSE (floor(x * power(10, s)) + 1) / power(10, s) END"),
    # TRY_ twin of TO_NUMBER_FMT: unparseable or out-of-range for
    # (prec, scale) -> NULL instead of error; same half-away rounding
    # to ``scale``.
    "TRY_TO_NUMBER_FMT": (
        "(s STRING, prec INT, scale INT) RETURNS DECIMAL(38,6) RETURN "
        "CASE WHEN TRY_CAST(replace(replace(trim(s), ',', ''), '$', '') "
        "       AS DECIMAL(38,6)) IS NULL THEN NULL "
        "WHEN CAST(abs(CAST(TRY_CAST(replace(replace(trim(s), ',', ''), "
        "       '$', '') AS DECIMAL(38,6)) "
        "       * CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) "
        "       AS DECIMAL(38,0))) AS DOUBLE) "
        "     >= power(10, coalesce(prec, 38)) THEN NULL "
        "ELSE CAST(TRY_CAST(replace(replace(trim(s), ',', ''), '$', "
        "     '') AS DECIMAL(38,6)) "
        "     * CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) "
        "     AS DECIMAL(38,0)) "
        "     / CAST(power(10, coalesce(scale, 0)) AS DECIMAL(18,0)) END"),
})


# ---------------------------------------------------------------------------
# Regex family with Snowflake parameter semantics (reference
# BodoSQL/bodosql/kernels/regexp_array_kernels.py). Snowflake regex args:
# position (1-based search start), occurrence (1-based match index),
# parameters string ('c' case-sensitive [default], 'i' insensitive -- last
# of c/i wins, 'm' multiline, 's' dot-matches-newline, 'e' extract group),
# group number. Re-expressed as Java inline-flag prefixes + array ops over
# regexp_extract_all/split, so everything stays a JVM codegen expression.
# ---------------------------------------------------------------------------

def _rx_flags(par: str) -> str:
    """SQL fragment: Java inline flags active for parameter string col."""
    return (f"concat("
            f"CASE WHEN instr({par},'i') > instr({par},'c') THEN 'i' ELSE '' END,"
            f"CASE WHEN instr({par},'m') > 0 THEN 'm' ELSE '' END,"
            f"CASE WHEN instr({par},'s') > 0 THEN 's' ELSE '' END)")


def _rx_pat(inner: str, par: str) -> str:
    """SQL fragment: pattern with the inline-flag prefix applied."""
    fl = _rx_flags(par)
    return (f"concat(CASE WHEN length({fl}) > 0 "
            f"THEN concat('(?', {fl}, ')') ELSE '' END, {inner})")


def _rx_instr(opt_end: str) -> str:
    """Position of the occ-th match (1-based in s; 0 if absent).
    Derivation: with parts = split-by-pattern and ms = all matches over
    substr(s, pos), the occ-th match starts after the first occ parts and
    the first occ-1 matches."""
    pat = _rx_pat("p", "par")
    ms = f"regexp_extract_all(substr(s, pos), {pat}, 0)"
    parts = f"split(substr(s, pos), {pat}, -1)"
    start = (f"pos - 1 + 1"
             f" + aggregate(slice({parts}, 1, occ), 0, (a, x) -> a + length(x))"
             f" + aggregate(slice({ms}, 1, occ - 1), 0, (a, x) -> a + length(x))")
    return (f"CASE WHEN occ < 1 OR size({ms}) < occ THEN 0 "
            f"ELSE {start} + {opt_end} END")


SNOWFLAKE_SQL_FNS.update({
    "REGEXP_LIKE3": (
        "(s STRING, p STRING, par STRING) RETURNS BOOLEAN RETURN "
        + "s RLIKE " + _rx_pat("concat('^(?:', p, ')$')", "par")),
    "REGEXP_COUNT4": (
        "(s STRING, p STRING, pos INT, par STRING) RETURNS INT RETURN "
        f"size(regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, 0))"),
    "REGEXP_SUBSTR6": (
        "(s STRING, p STRING, pos INT, occ INT, par STRING, grp INT) "
        "RETURNS STRING RETURN "
        f"try_element_at(regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, "
        "CASE WHEN instr(par, 'e') > 0 THEN grp ELSE 0 END), occ)"),
    "REGEXP_INSTR6": (
        "(s STRING, p STRING, pos INT, occ INT, opt INT, par STRING) "
        "RETURNS INT RETURN "
        + _rx_instr("CASE WHEN opt = 1 THEN length(element_at("
                    f"regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, 0),"
                    " occ)) ELSE 0 END")),
    # REGEXP_REPLACE with Snowflake position/occurrence/parameters:
    # occ=0 replaces every match from pos on; occ=n splices the
    # replacement over exactly the n-th match (prefix + repl + suffix via
    # the same split/extract offset math as REGEXP_INSTR).
    "REGEXP_REPLACE6": (
        "(s STRING, p STRING, repl STRING, pos INT, occ INT, par STRING) "
        "RETURNS STRING RETURN "
        "CASE WHEN occ = 0 THEN concat(substr(s, 1, pos - 1), "
        f"  regexp_replace(substr(s, pos), {_rx_pat('p', 'par')}, repl)) "
        f"WHEN size(regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, 0)) < occ "
        "  OR occ < 0 THEN s "
        "ELSE concat("
        "  substr(s, 1, pos - 1 "
        f"   + aggregate(slice(split(substr(s, pos), {_rx_pat('p', 'par')}, -1), 1, occ), 0, (a, x) -> a + length(x)) "
        f"   + aggregate(slice(regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, 0), 1, occ - 1), 0, (a, x) -> a + length(x))), "
        "  repl, "
        "  substr(s, pos "
        f"   + aggregate(slice(split(substr(s, pos), {_rx_pat('p', 'par')}, -1), 1, occ), 0, (a, x) -> a + length(x)) "
        f"   + aggregate(slice(regexp_extract_all(substr(s, pos), {_rx_pat('p', 'par')}, 0), 1, occ), 0, (a, x) -> a + length(x)))) "
        "END"),
    # semi-structured navigation + object kernels (reference
    # semi_structured_array_kernels.py get_path,
    # variadic_array_kernels.py object_*). Objects are MAP<STRING,STRING>;
    # OBJECT_DELETE/PICK registered at 2-key arity (SQL UDFs are
    # fixed-arity; the DataFrame-side map_filter composes for more).
    "GET_PATH": (
        "(js STRING, path STRING) RETURNS STRING RETURN "
        "get_json_object(js, concat('$.', path))"),
    "OBJECT_KEYS": (
        "(m MAP<STRING,STRING>) RETURNS ARRAY<STRING> RETURN "
        "sort_array(map_keys(m))"),
    "OBJECT_INSERT": (
        "(m MAP<STRING,STRING>, k STRING, v STRING, upd BOOLEAN) "
        "RETURNS MAP<STRING,STRING> RETURN "
        "CASE WHEN assert_true(upd OR NOT array_contains(map_keys(m), k), "
        "'OBJECT_INSERT: duplicate key') IS NULL THEN "
        "map_from_entries(concat(filter(map_entries(m), e -> e.key <> k), "
        "array(struct(k AS key, v AS value)))) END"),
    "OBJECT_DELETE2": (
        "(m MAP<STRING,STRING>, k1 STRING, k2 STRING) "
        "RETURNS MAP<STRING,STRING> RETURN "
        "map_filter(m, (k, v) -> k <> k1 AND k <> k2)"),
    "OBJECT_PICK2": (
        "(m MAP<STRING,STRING>, k1 STRING, k2 STRING) "
        "RETURNS MAP<STRING,STRING> RETURN "
        "map_filter(m, (k, v) -> k = k1 OR k = k2)"),
    "OBJECT_FILTER_KEYS": (
        "(m MAP<STRING,STRING>, ks ARRAY<STRING>, keep BOOLEAN) "
        "RETURNS MAP<STRING,STRING> RETURN "
        "map_filter(m, (k, v) -> array_contains(ks, k) = keep)"),
})

# datetime interval/diff family (reference datetime_array_kernels.py
# add_interval_*/diff_*/previous_day). DIFF_* uses Snowflake DATEDIFF
# boundary-crossing semantics (datediff(day, 23:00 -> next 01:00) = 1),
# NOT elapsed-whole-units -- hence the date_trunc formulations.
SNOWFLAKE_SQL_FNS.update({
    f"ADD_INTERVAL_{u}S": (
        "(ts TIMESTAMP, n INT) RETURNS TIMESTAMP RETURN "
        f"timestampadd({u}, n, ts)")
    for u in ("YEAR", "QUARTER", "MONTH", "WEEK", "DAY",
              "HOUR", "MINUTE", "SECOND")
})
SNOWFLAKE_SQL_FNS.update({
    "DIFF_YEARS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                   "CAST(year(b) - year(a) AS BIGINT)"),
    "DIFF_QUARTERS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                      "CAST((year(b) - year(a)) * 4 "
                      "+ (quarter(b) - quarter(a)) AS BIGINT)"),
    "DIFF_MONTHS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                    "CAST((year(b) - year(a)) * 12 "
                    "+ (month(b) - month(a)) AS BIGINT)"),
    "DIFF_WEEKS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                   "CAST(datediff(CAST(date_trunc('WEEK', b) AS DATE), "
                   "CAST(date_trunc('WEEK', a) AS DATE)) AS BIGINT) DIV 7"),
    "DIFF_DAYS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                  "CAST(datediff(CAST(b AS DATE), CAST(a AS DATE)) AS BIGINT)"),
    "DIFF_HOURS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                   "(unix_timestamp(date_trunc('HOUR', b)) "
                   "- unix_timestamp(date_trunc('HOUR', a))) DIV 3600"),
    "DIFF_MINUTES": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                     "(unix_timestamp(date_trunc('MINUTE', b)) "
                     "- unix_timestamp(date_trunc('MINUTE', a))) DIV 60"),
    "DIFF_SECONDS": ("(a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT RETURN "
                     "unix_timestamp(b) - unix_timestamp(a)"),
    # latest <dow> strictly before d: the unique <dow> in [d-7, d-1],
    # i.e. next_day() of d-8 (next_day is strictly-after)
    "PREVIOUS_DAY": ("(d DATE, dow STRING) RETURNS DATE RETURN "
                     "next_day(date_sub(d, 8), dow)"),
})

# conversion phase 4 (reference snowflake_conversion_array_kernels.py
# to_time/timestamp_from_parts/to_char-numeric). TIME values follow the
# repo-wide model (SURVEY 1.4: no Spark TIME type) as 1970-01-01
# timestamps -- same convention as TIME_FROM_PARTS/TIME_SLICE above.
SNOWFLAKE_SQL_FNS.update({
    # _SF suffix: Spark 4.1 reserves to_time/try_to_time for its TIME
    # type, which is present but disabled (UNSUPPORTED_TIME_TYPE), and
    # builtin names cannot be shadowed by SQL UDFs -- same convention as
    # TO_DATE_SF/TO_TIMESTAMP_SF above.
    "TO_TIME_SF": ("(s STRING) RETURNS TIMESTAMP RETURN "
                   "to_timestamp(concat('1970-01-01 ', s))"),
    "TRY_TO_TIME_SF": ("(s STRING) RETURNS TIMESTAMP RETURN "
                       "try_to_timestamp(concat('1970-01-01 ', s))"),
    "TIMESTAMP_FROM_PARTS": (
        "(y INT, mo INT, d INT, h INT, mi INT, s INT) RETURNS TIMESTAMP "
        "RETURN make_timestamp(y, mo, d, h, mi, s)"),
    "TIMESTAMP_NTZ_FROM_PARTS": (
        "(y INT, mo INT, d INT, h INT, mi INT, s INT) RETURNS TIMESTAMP_NTZ "
        "RETURN make_timestamp_ntz(y, mo, d, h, mi, s)"),
    # Snowflake numeric TO_TIMESTAMP auto-scaling (reference
    # snowflake_conversion_array_kernels.py number_to_datetime): a bare
    # number is seconds / millis / micros / nanos after the epoch,
    # chosen by magnitude at the 31536000000 (ms-per-year) thresholds.
    "TO_TIMESTAMP_NUM": (
        "(n BIGINT) RETURNS TIMESTAMP RETURN CASE "
        "WHEN abs(n) < 31536000000 THEN timestamp_seconds(n) "
        "WHEN abs(n) < CAST(31536000000 AS BIGINT) * 1000 "
        "  THEN timestamp_millis(n) "
        "WHEN abs(n) < CAST(31536000000 AS BIGINT) * 1000000 "
        "  THEN timestamp_micros(n) "
        "ELSE timestamp_micros(CAST(n DIV 1000 AS BIGINT)) END"),
    # TIMESTAMP_TZ_FROM_PARTS (reference datetime_array_kernels.py:322):
    # wall-clock parts interpreted in the named zone; Spark's
    # make_timestamp has exactly this timezone argument.
    "TIMESTAMP_TZ_FROM_PARTS": (
        "(y INT, mo INT, d INT, h INT, mi INT, s INT, tz STRING) "
        "RETURNS TIMESTAMP RETURN make_timestamp(y, mo, d, h, mi, s, tz)"),
    # ------------------------------------------------------------------
    # TO_CHAR numeric display masks (reference
    # snowflake_conversion_array_kernels.py TO_CHAR(number) family).
    # Supported tokens: FM prefix (no blank fill), $ currency, S prefix
    # (always-signed), MI suffix (trailing sign), digits 9/0 (positions
    # from the first '0' are zero-forced), ',' grouping, '.' decimals.
    # Semantics: round half-away-from-zero to the mask's scale; value
    # wider than the integer mask -> '#' * len(fmt) (Snowflake
    # overflow fill); non-FM output is right-justified to mask width +
    # sign slot. Documented delta: a pure-fraction value renders '0.xx'
    # (Oracle/Snowflake render '.xx'). Masks are runtime values, so
    # this is spelled out over string ops (Spark's to_char/round need
    # FOLDABLE formats -- a UDF parameter can't reach them); the _NF_*
    # helpers keep each piece readable and are registered first.
    "_NF_GRP": (
        "(s STRING) RETURNS STRING RETURN "
        "reverse(regexp_replace(reverse(s), '([0-9]{3})(?=[0-9])', '$1,'))"),
    # fmt minus the FM prefix and MI suffix
    "_NF_CORE": (
        "(fmt STRING) RETURNS STRING RETURN "
        "CASE WHEN upper(CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3) "
        "ELSE fmt END) LIKE '%MI' "
        "THEN substr(CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3) "
        "ELSE fmt END, 1, length(CASE WHEN fmt LIKE 'FM%' "
        "THEN substr(fmt, 3) ELSE fmt END) - 2) "
        "ELSE CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3) ELSE fmt END "
        "END"),
    # digit/separator skeleton of the core mask
    "_NF_MASK": (
        "(core STRING) RETURNS STRING RETURN "
        "regexp_replace(core, '[^09.,]', '')"),
    "_NF_SCALE": (
        "(mask STRING) RETURNS INT RETURN "
        "CASE WHEN instr(mask, '.') = 0 THEN 0 "
        "ELSE length(mask) - instr(mask, '.') END"),
    # |x| * 10^scale rounded half-away via decimal cast, as digits
    "_NF_SCALED": (
        "(x DOUBLE, sc INT) RETURNS STRING RETURN "
        "CAST(CAST(abs(x) * power(10, sc) AS DECIMAL(30,0)) AS STRING)"),
    # scaled digits left-padded so the int/frac split below is safe
    "_NF_PADSC": (
        "(x DOUBLE, fmt STRING) RETURNS STRING RETURN "
        "lpad(_NF_SCALED(x, _NF_SCALE(_NF_MASK(_NF_CORE(fmt)))), "
        "greatest(length(_NF_SCALED(x, _NF_SCALE(_NF_MASK(_NF_CORE(fmt))))),"
        " _NF_SCALE(_NF_MASK(_NF_CORE(fmt))) + 1), '0')"),
    "_NF_INTRAW": (
        "(x DOUBLE, fmt STRING) RETURNS STRING RETURN "
        "substr(_NF_PADSC(x, fmt), 1, length(_NF_PADSC(x, fmt)) - "
        "_NF_SCALE(_NF_MASK(_NF_CORE(fmt))))"),
    "_NF_FRACSTR": (
        "(x DOUBLE, fmt STRING) RETURNS STRING RETURN "
        "substr(_NF_PADSC(x, fmt), length(_NF_PADSC(x, fmt)) - "
        "_NF_SCALE(_NF_MASK(_NF_CORE(fmt))) + 1)"),
    # integer digits with the mask's zero-forcing applied
    "_NF_INTSTR": ("""(x DOUBLE, fmt STRING) RETURNS STRING RETURN
CASE WHEN length(_NF_INTRAW(x, fmt)) >=
       CASE WHEN instr(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''), '0') = 0 THEN 1
            ELSE length(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''))
                 - instr(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''), '0') + 1 END
     THEN _NF_INTRAW(x, fmt)
     ELSE lpad(_NF_INTRAW(x, fmt),
       CASE WHEN instr(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''), '0') = 0 THEN 1
            ELSE length(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''))
                 - instr(replace(substring_index(_NF_MASK(_NF_CORE(fmt)),
                '.', 1), ',', ''), '0') + 1 END, '0')
END"""),
    # sign + $ + grouped int + decimals, before any width padding
    "_NF_BODY": ("""(x DOUBLE, fmt STRING) RETURNS STRING RETURN
concat(
  CASE WHEN upper(CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3)
            ELSE fmt END) LIKE '%MI' THEN ''
       WHEN x < 0 THEN '-'
       WHEN upper(_NF_CORE(fmt)) LIKE 'S%' THEN '+' ELSE '' END,
  CASE WHEN instr(_NF_CORE(fmt), '$') > 0 THEN '$' ELSE '' END,
  CASE WHEN instr(substring_index(_NF_MASK(_NF_CORE(fmt)), '.', 1),
             ',') > 0
       THEN _NF_GRP(_NF_INTSTR(x, fmt)) ELSE _NF_INTSTR(x, fmt) END,
  CASE WHEN _NF_SCALE(_NF_MASK(_NF_CORE(fmt))) > 0
       THEN concat('.', _NF_FRACSTR(x, fmt)) ELSE '' END)"""),
    # hex display masks (X = uppercase hex digit, x = lowercase; 0
    # positions zero-force like numeric masks; negatives/overflow -> '#')
    "_NF_XM": (
        "(fmt STRING) RETURNS STRING RETURN "
        "regexp_replace(_NF_CORE(fmt), '[^0Xx]', '')"),
    "_NF_XHEX": (
        "(x DOUBLE) RETURNS STRING RETURN "
        "conv(CAST(CAST(abs(x) AS DECIMAL(30,0)) AS STRING), 10, 16)"),
    "_NF_XBODY": ("""(x DOUBLE, fmt STRING) RETURNS STRING RETURN
CASE WHEN instr(_NF_XM(fmt), 'x') > 0
     THEN lower(lpad(_NF_XHEX(x),
       greatest(length(_NF_XHEX(x)),
         CASE WHEN instr(_NF_XM(fmt), '0') = 0 THEN 1
              ELSE length(_NF_XM(fmt)) - instr(_NF_XM(fmt), '0') + 1 END),
       '0'))
     ELSE lpad(_NF_XHEX(x),
       greatest(length(_NF_XHEX(x)),
         CASE WHEN instr(_NF_XM(fmt), '0') = 0 THEN 1
              ELSE length(_NF_XM(fmt)) - instr(_NF_XM(fmt), '0') + 1 END),
       '0') END"""),
    "TO_CHAR_NUM": ("""(x DOUBLE, fmt STRING) RETURNS STRING RETURN
CASE WHEN x IS NULL OR fmt IS NULL THEN NULL
WHEN upper(_NF_CORE(fmt)) LIKE '%X%' THEN
  CASE WHEN x < 0
         OR length(_NF_XHEX(x)) > length(_NF_XM(fmt))
       THEN repeat('#', length(fmt))
       WHEN fmt LIKE 'FM%' THEN _NF_XBODY(x, fmt)
       ELSE lpad(_NF_XBODY(x, fmt),
                 greatest(length(_NF_XBODY(x, fmt)),
                          length(_NF_CORE(fmt))), ' ') END
WHEN length(_NF_INTRAW(x, fmt)) >
     length(replace(substring_index(_NF_MASK(_NF_CORE(fmt)), '.', 1),
            ',', ''))
  THEN repeat('#', length(fmt))
ELSE concat(
  CASE WHEN fmt LIKE 'FM%' THEN _NF_BODY(x, fmt)
       ELSE lpad(_NF_BODY(x, fmt),
         greatest(length(_NF_BODY(x, fmt)),
           length(_NF_CORE(fmt)) +
           CASE WHEN upper(_NF_CORE(fmt)) LIKE 'S%'
                  OR upper(CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3)
                           ELSE fmt END) LIKE '%MI'
                THEN 0 ELSE 1 END), ' ') END,
  CASE WHEN upper(CASE WHEN fmt LIKE 'FM%' THEN substr(fmt, 3)
            ELSE fmt END) LIKE '%MI'
       THEN CASE WHEN x < 0 THEN '-' WHEN fmt LIKE 'FM%' THEN ''
            ELSE ' ' END
       ELSE '' END)
END"""),
})


# ---------------------------------------------------------------------------
# Jaro-Winkler (reference string_array_kernels.py jarowinkler_similarity)
# ---------------------------------------------------------------------------

def jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler similarity in [0,1]: match window
    max(|a|,|b|)/2-1, transpositions halved, Winkler prefix boost
    (p=0.1, prefix<=4) applied only when the Jaro score exceeds 0.7.
    Matches DuckDB's jaro_winkler_similarity (validated pairwise)."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0  # incl. both-empty: matches DuckDB/Snowflake
    if s1 == s2:
        return 1.0
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def jaro_winkler_batch(a, b):
    """Vectorized Jaro-Winkler over two equal-length string sequences.

    Same semantics as ``jaro_winkler`` (differential-tested against it),
    but the greedy match loop runs across ALL pairs at once: one numpy
    boolean pass per character position of the longer left string instead
    of a Python loop per character per pair. Arrays are (B, Lmax) int32
    codepoint matrices (-1 pad); the sequential dependency (a char of
    ``b`` may be claimed by at most one char of ``a``) stays, but only
    along the short L axis -- the B axis is fully data-parallel.

    Micro-bench (this container, 100k ASCII pairs, best of 3):
    6-12 chars: loop 0.75 s -> batch 0.143 s (5.3x); 20-40 chars:
    3.38 s -> 0.602 s (5.6x); mixed 2-60 chars: 2.76 s -> 0.597 s (4.6x).

    Returns float64 ndarray with NaN where either input is None/NaN.
    """
    import numpy as np

    B = len(a)
    out = np.zeros(B, dtype=np.float64)
    if B == 0:
        return out
    av = np.asarray(a, dtype=object)
    bv = np.asarray(b, dtype=object)
    valid = ~(pd.isna(av) | pd.isna(bv))
    s1 = np.where(valid, av, "")
    s2 = np.where(valid, bv, "")
    n1 = np.fromiter((len(x) for x in s1), dtype=np.int64, count=B)
    n2 = np.fromiter((len(x) for x in s2), dtype=np.int64, count=B)
    L1, L2 = int(n1.max(initial=1)) or 1, int(n2.max(initial=1)) or 1

    joined1, joined2 = "".join(s1), "".join(s2)
    ascii_ok = joined1.isascii() and joined2.isascii()

    def _pack(joined, lens, L, pad):
        # one C-speed encode of the whole batch, scattered by length mask;
        # ASCII batches stay int16 (4x less memory traffic in the loop).
        # A and C use DIFFERENT pad values so pad never matches pad.
        if ascii_ok:
            codes = np.frombuffer(joined.encode(), dtype=np.uint8)
            M = np.full((B, L), pad, dtype=np.int16)
        else:
            codes = np.frombuffer(joined.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.int64)
            M = np.full((B, L), pad, dtype=np.int64)
        M[np.arange(L)[None, :] < lens[:, None]] = codes
        return M

    # Rows sorted by left length DESCENDING: iteration i then only works
    # on the contiguous prefix of rows with n1 > i (a view, no copy), so
    # total loop work is sum(n1) not B*max(n1) -- the win grows with
    # length skew. Only worth the gather copies when the skew saves
    # enough work; near-uniform batches keep input order.
    if n1.sum() < 0.7 * B * L1:
        order = np.argsort(-n1, kind="stable")
        inv = np.empty(B, dtype=np.int64)
        inv[order] = np.arange(B)
        n1s, n2s = n1[order], n2[order]
        A = _pack(joined1, n1, L1, -2)[order]
        C = _pack(joined2, n2, L2, -1)[order]
    else:
        order = inv = slice(None)
        n1s, n2s = n1, n2
        A = _pack(joined1, n1, L1, -2)
        C = _pack(joined2, n2, L2, -1)
    # rows with n1 > i are exactly [0, active[i]) in the sorted layout;
    # unsorted layout processes every row each iteration (pads are inert)
    if isinstance(order, slice):
        active = np.full(L1, B, dtype=np.int64)
    else:
        active = np.searchsorted(-n1s, -np.arange(1, L1 + 1), side="right")

    wcol = (np.maximum(n1s, n2s) // 2 - 1)[:, None].astype(np.int32)
    cols2 = np.arange(L2, dtype=np.int32)[None, :]
    m1 = np.zeros((B, L1), dtype=bool)
    m2 = np.zeros((B, L2), dtype=bool)
    cand = np.empty((B, L2), dtype=bool)
    for i in range(L1):
        k = int(active[i])
        if k == 0:
            break
        ck, mk = cand[:k], m2[:k]
        np.equal(C[:k], A[:k, i, None], out=ck)
        ck &= np.abs(cols2 - np.int32(i)) <= wcol[:k]
        # one-claim-per-char rule: cand & ~m2 == cand > m2 for bools
        np.greater(ck, mk, out=ck)
        j = ck.argmax(axis=1)
        has = ck[np.arange(k), j]
        mk[has, j[has]] = True
        m1[:k][has, i] = True
    m = m1.sum(axis=1)

    # Transpositions: scatter each side's matched chars into rank order,
    # then count positional disagreements (validity follows from equal
    # match counts per row, so the -1 pad never compares unequal-vs-char).
    mm = int(m.max(initial=1)) or 1
    g1 = np.full((B, mm), -1, dtype=np.int32)
    g2 = np.full((B, mm), -1, dtype=np.int32)
    r1, c1 = np.nonzero(m1)
    g1[r1, (m1.cumsum(axis=1) - 1)[r1, c1]] = A[r1, c1]
    r2, c2 = np.nonzero(m2)
    g2[r2, (m2.cumsum(axis=1) - 1)[r2, c2]] = C[r2, c2]
    t = ((g1 != g2) & (g1 >= 0)).sum(axis=1) // 2

    ok = (m > 0)
    ms = np.where(m == 0, 1, m).astype(np.float64)
    jaro = np.where(
        ok,
        (ms / np.where(n1s == 0, 1, n1s) + ms / np.where(n2s == 0, 1, n2s)
         + (ms - t) / ms) / 3.0,
        0.0)
    pl = min(4, L1, L2)
    if pl > 0:
        eq = (A[:, :pl] == C[:, :pl]) & (A[:, :pl] >= 0)
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(B, dtype=np.int64)
    boosted = np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)
    out = np.where(ok, boosted, 0.0)[inv]  # back to input row order
    # identical non-empty strings are 1.0 regardless of the match window
    # (a 1-char string has window -1 and would otherwise score 0)
    ident = valid & (n1 > 0) & (s1 == s2)
    out[ident] = 1.0
    out[~valid] = np.nan
    return out


def _register_jaro_winkler(spark: SparkSession) -> None:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _jw100(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        sim = jaro_winkler_batch(a.to_numpy(object), b.to_numpy(object))
        # half-up (not banker's) to match SQL round semantics
        scaled = np.floor(100 * sim + 0.5)
        res = pd.array(
            np.where(np.isnan(scaled), 0, scaled).astype("int64"),
            dtype="Int64")
        res[np.isnan(scaled)] = pd.NA
        return pd.Series(res)

    spark.udf.register("JAROWINKLER_SIMILARITY", _jw100)


# Default-argument arities (SQL UDFs are fixed-arity, so Snowflake's
# optional position/occurrence/parameters arguments land as thin
# forwarding shims with the documented defaults). Defined LAST: a SQL
# UDF body referencing another temp function is analyzed at CREATE
# time, so the forwarded-to kernels must already be registered.
SNOWFLAKE_SQL_FNS.update({
    "CHARINDEX2": ("(sub STRING, s STRING) RETURNS INT RETURN "
                   "CHARINDEX(sub, s, 1)"),
    "POSITION2": ("(sub STRING, s STRING) RETURNS INT RETURN "
                  "POSITION3(sub, s, 1)"),
    "REGEXP_COUNT2": ("(s STRING, p STRING) RETURNS INT RETURN "
                      "REGEXP_COUNT4(s, p, 1, 'c')"),
    "REGEXP_SUBSTR2": ("(s STRING, p STRING) RETURNS STRING RETURN "
                       "REGEXP_SUBSTR6(s, p, 1, 1, 'c', 0)"),
    "REGEXP_INSTR2": ("(s STRING, p STRING) RETURNS INT RETURN "
                      "REGEXP_INSTR6(s, p, 1, 1, 0, 'c')"),
    "REGEXP_REPLACE3": (
        "(s STRING, p STRING, r STRING) RETURNS STRING RETURN "
        "REGEXP_REPLACE6(s, p, r, 1, 0, 'c')"),
    "STRTOK2": ("(s STRING, delim STRING) RETURNS STRING RETURN "
                "split_part(s, delim, 1)"),
})


def register_snowflake_fns(spark: SparkSession) -> None:
    """Register the dialect kernel surface on a session (idempotent).

    Feature-detects SQL-UDF support with a probe function once; after
    that, a registration failure is a real bug in a kernel body and
    RAISES (silently skipping left broken kernels undiscoverable until
    a query used them)."""
    try:
        spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION _BODO_SPARK_PROBE"
                  "(x INT) RETURNS INT RETURN x")
    except Exception:
        return  # Spark build without SQL UDF support: shims unavailable
    for name, body in SNOWFLAKE_SQL_FNS.items():
        try:
            spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
        except Exception as e:
            raise RuntimeError(
                f"failed to register dialect kernel {name}: {e}") from e
    _register_jaro_winkler(spark)


# ---------------------------------------------------------------------------
# LATERAL FLATTEN (reference BodoSQL/bodosql/kernels/lateral.py:100)
# ---------------------------------------------------------------------------

def flatten(df: DataFrame, col: str | Column, seq_col: str,
            outer: bool = False) -> DataFrame:
    """Snowflake LATERAL FLATTEN over an ARRAY or OBJECT(map) column:
    the full 6-output struct (SEQ, KEY, PATH, INDEX, VALUE, THIS)
    alongside the input row.

    SEQ is taken from ``seq_col`` (Snowflake's SEQ is an opaque per-row
    number; an explicit key keeps results deterministic/oracle-checkable).
    Arrays: KEY is NULL, PATH '[i]', INDEX the 0-based position.
    Objects (MapType): KEY the field name, PATH = KEY, INDEX NULL --
    Snowflake's object-flatten contract. VALUE the element, THIS the
    whole input collection. ``outer=True`` keeps rows whose collection
    is empty/NULL with NULL flatten outputs.
    """
    from pyspark.sql import types as T

    c = F.col(col) if isinstance(col, str) else col
    dt = df.select(c.alias("_f")).schema[0].dataType
    passthrough = [x for x in df.columns if x != seq_col]
    # fixed output order regardless of input type (array vs map):
    # SEQ, passthrough..., KEY, PATH, INDEX, VALUE, THIS
    tail = ["KEY", "PATH", "INDEX", "VALUE", "THIS"]
    if isinstance(dt, T.MapType):
        ex = F.explode_outer(c) if outer else F.explode(c)
        out = (df.withColumn("THIS", c)
               .select(F.col(seq_col).alias("SEQ"), "*",
                       ex.alias("KEY", "VALUE"))
               .withColumn("INDEX", F.lit(None).cast("int"))
               .withColumn("PATH", F.col("KEY").cast("string")))
    else:
        ex = F.posexplode_outer(c) if outer else F.posexplode(c)
        out = (df.withColumn("THIS", c)
               .select(F.col(seq_col).alias("SEQ"), "*",
                       ex.alias("INDEX", "VALUE"))
               .withColumn("KEY", F.lit(None).cast("string"))
               .withColumn("PATH",
                           F.concat(F.lit("["), F.col("INDEX"), F.lit("]"))))
    return out.select("SEQ", *passthrough, *tail)
