"""String-function battery (SURVEY.md 2.8): the reference's string kernel
library (reference BodoSQL/bodosql/kernels/string_array_kernels.py, 3056
LoC; like_array_kernels.py; regexp_array_kernels.py) re-expressed with
built-in Spark functions -- JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, bint, tbl


def str_basic_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """upper/lower/length/trim/pad/reverse/repeat/substring/replace/
    concat_ws/translate/left/right (all 1:1 builtins)."""
    p = tbl(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        bint(F.length("p_name")).alias("len"),
        F.ltrim(F.rtrim(F.col("p_name"))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "#").alias("rpadded"),
        F.reverse("p_name").alias("rev"),
        F.repeat(F.col("p_type"), 2).alias("rep2"),
        F.substring("p_name", 2, 5).alias("sub25"),
        F.regexp_replace("p_name", " ", "_").alias("underscored"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("joined"),
        F.translate("p_name", "aeiou", "AEIOU").alias("translated"),
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_name, 4)").alias("r4"),
    )


_STR_BASIC_SQL = """
SELECT p_partkey,
       upper(p_name) AS up, lower(p_brand) AS lo, length(p_name) AS len,
       ltrim(rtrim(p_name)) AS trimmed,
       lpad(p_brand, 12, '*') AS lpadded, rpad(p_brand, 12, '#') AS rpadded,
       reverse(p_name) AS rev, repeat(p_type, 2) AS rep2,
       substring(p_name, 2, 5) AS sub25,
       replace(p_name, ' ', '_') AS underscored,
       concat_ws('|', p_brand, p_type, p_name) AS joined,
       translate(p_name, 'aeiou', 'AEIOU') AS translated,
       left(p_name, 4) AS l4, right(p_name, 4) AS r4
FROM part
"""


def str_position_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """instr/strpos/startswith/endswith/contains/split_part/ascii/chr."""
    p = tbl(spark, sf, "part")
    return p.select(
        "p_partkey",
        bint(F.instr("p_name", "e")).alias("pos_e"),
        F.col("p_name").startswith("red").cast("boolean").alias("is_red"),
        F.col("p_name").endswith("bolt").cast("boolean").alias("is_bolt"),
        F.col("p_name").contains("widget").alias("has_widget"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("word1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1)).alias("last_word"),
        bint(F.ascii("p_brand")).alias("first_ascii"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26)).alias("letter"),
    )


_STR_POS_SQL = """
SELECT p_partkey,
       strpos(p_name, 'e') AS pos_e,
       starts_with(p_name, 'red') AS is_red,
       ends_with(p_name, 'bolt') AS is_bolt,
       contains(p_name, 'widget') AS has_widget,
       split_part(p_name, ' ', 1) AS word1,
       split_part(p_name, ' ', -1) AS last_word,
       ascii(p_brand) AS first_ascii,
       chr(CAST(65 + p_partkey % 26 AS INT)) AS letter
FROM part
"""


def str_like_count(spark: SparkSession, sf: str) -> DataFrame:
    """LIKE / ILIKE (reference like_array_kernels.py dict-encoded fast
    path -> Spark handles dictionary parquet pages internally)."""
    p = tbl(spark, sf, "part")
    return p.agg(
        F.count_if(F.col("p_name").like("%wid%")).alias("n_like"),
        F.count_if(F.col("p_name").ilike("RED%")).alias("n_ilike"),
        F.count_if(F.col("p_name").rlike("^(red|blue) ")).alias("n_rlike"),
        F.count(F.lit(1)).alias("n"))


_STR_LIKE_SQL = """
SELECT CAST(count_if(p_name LIKE '%wid%') AS BIGINT) AS n_like,
       CAST(count_if(p_name ILIKE 'RED%') AS BIGINT) AS n_ilike,
       CAST(count_if(regexp_matches(p_name, '^(red|blue) ')) AS BIGINT) AS n_rlike,
       COUNT(*) AS n
FROM part
"""


def str_regexp_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract / regexp_replace / regexp_count (reference
    regexp_array_kernels.py -- POSIX->engine-regex rewrites; patterns
    here are portable)."""
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit("scan")).cast("bigint").alias("n_scan"),
        bint(F.length(F.regexp_replace("text", "[aeiou]", ""))).alias("len_novowel"),
    )


_STR_REGEXP_SQL = """
SELECT doc_id,
       coalesce(regexp_extract(text, '([a-z]+)', 1), '') AS first_word,
       (length(text) - length(regexp_replace(text, 'scan', '', 'g'))) // 4
         AS n_scan,
       length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowel
FROM documents
"""


def str_split_explode(spark: SparkSession, sf: str) -> DataFrame:
    """split + explode (reference SPLIT_TO_TABLE / lateral flatten,
    BodoSQL kernels/lateral.py): top-20 words in part names."""
    p = tbl(spark, sf, "part")
    words = p.select(F.explode(F.split("p_name", " ")).alias("word"))
    return (words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("word"))
            .limit(20))


_STR_SPLIT_SQL = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def str_posexplode(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode (reference lateral flatten index output,
    BodoSQL kernels/lateral.py:100): word + 0-based position."""
    p = tbl(spark, sf, "part")
    w = F.split("p_name", " ")
    return (p.select("p_partkey",
                     F.posexplode(w).alias("pos", "word"))
            .groupBy("word", F.col("pos").cast("bigint").alias("pos"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("word", "pos"))


_STR_POSEXPLODE_SQL = """
SELECT word, pos, COUNT(*) AS n
FROM (
  SELECT p_partkey,
         unnest(list_transform(range(1, len(string_split(p_name, ' ')) + 1),
                               i -> i - 1)) AS pos,
         unnest(string_split(p_name, ' ')) AS word
  FROM part) t
GROUP BY word, pos ORDER BY word, pos
"""


def str_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    """Edit distance (reference editdistance kernels) -- identical DP
    definition in both engines."""
    p = tbl(spark, sf, "part")
    return (p.groupBy("p_type").agg(
        bint(F.min(F.levenshtein(F.col("p_name"), F.lit("red widget"))))
        .alias("min_dist"),
        bint(F.max(F.levenshtein(F.col("p_name"), F.lit("red widget"))))
        .alias("max_dist"))
        .orderBy("p_type"))


_STR_LEV_SQL = """
SELECT p_type,
       MIN(levenshtein(p_name, 'red widget')) AS min_dist,
       MAX(levenshtein(p_name, 'red widget')) AS max_dist
FROM part GROUP BY p_type ORDER BY p_type
"""


def str_hash_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """md5 / sha2-256 / hex-encodings (reference crypto_funcs.py,
    _crypto_funcs.cpp, _base64.cpp)."""
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("hex8"),
        F.base64(F.encode(F.substring("text", 1, 9), "utf-8")).alias("b64"),
    )


_STR_HASH_SQL = """
SELECT doc_id,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       upper(hex(CAST(substring(text, 1, 8) AS BLOB))) AS hex8,
       to_base64(CAST(substring(text, 1, 9) AS BLOB)) AS b64
FROM documents
"""


def str_like_any_all(spark: SparkSession, sf: str) -> DataFrame:
    """LIKE ANY / LIKE ALL / NOT LIKE ANY quantified predicates
    (reference like_array_kernels.py like_kernel variants; Spark parses
    them natively)."""
    p = tbl(spark, sf, "part")
    return (p.selectExpr(
        "p_partkey",
        "p_name LIKE ANY ('%red%', '%blue%') AS any_color",
        "p_name LIKE ALL ('%e%', '% %') AS all_common",
        "p_name NOT LIKE ANY ('%a%', '%e%') AS no_vowelish")
        .where("p_partkey < 2000")
        .orderBy("p_partkey"))


_STR_LIKE_ANY_SQL = """
SELECT p_partkey,
       (p_name LIKE '%red%' OR p_name LIKE '%blue%') AS any_color,
       (p_name LIKE '%e%' AND p_name LIKE '% %') AS all_common,
       NOT (p_name LIKE '%a%' AND p_name LIKE '%e%') AS no_vowelish
FROM part WHERE p_partkey < 2000 ORDER BY p_partkey
"""


QUERIES: dict[str, QueryDef] = {
    "str_like_any_all": QueryDef(str_like_any_all, _STR_LIKE_ANY_SQL),
    "str_basic_funcs": QueryDef(str_basic_funcs, _STR_BASIC_SQL),
    "str_position_funcs": QueryDef(str_position_funcs, _STR_POS_SQL),
    "str_like_count": QueryDef(str_like_count, _STR_LIKE_SQL),
    "str_regexp_funcs": QueryDef(str_regexp_funcs, _STR_REGEXP_SQL),
    "str_split_explode": QueryDef(str_split_explode, _STR_SPLIT_SQL),
    "str_posexplode": QueryDef(str_posexplode, _STR_POSEXPLODE_SQL),
    "str_levenshtein": QueryDef(str_levenshtein, _STR_LEV_SQL),
    "str_hash_funcs": QueryDef(str_hash_funcs, _STR_HASH_SQL),
}
