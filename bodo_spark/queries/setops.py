"""Set-operation battery (SURVEY.md 2.7): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL], union-by-name concat.

Reference parity: LogicalSetOperation / streaming union
(reference bodo/pandas/plan.py:456, bodo/libs/streaming/union.py);
INTERSECT/EXCEPT codegen (reference BodoSQL SetOpCodeGen.java:211,338).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, tbl
from ..rowframe import local_df


def _cust_keys(spark, sf):
    return tbl(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"))


def _supp_keys(spark, sf):
    return tbl(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))


def setop_union_all(spark: SparkSession, sf: str) -> DataFrame:
    u = _cust_keys(spark, sf).union(_supp_keys(spark, sf))
    return (u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("nationkey"))


_SET_UNION_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) u GROUP BY nationkey ORDER BY nationkey
"""


def setop_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (_cust_keys(spark, sf).union(_supp_keys(spark, sf))
            .distinct().orderBy("nationkey"))


_SET_UNION_D_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Nation keys present in both high-balance customers and suppliers."""
    a = (tbl(spark, sf, "customer").where(F.col("c_acctbal") > 9000)
         .select(F.col("c_nationkey").alias("nationkey")))
    b = (tbl(spark, sf, "supplier").where(F.col("s_acctbal") > 0)
         .select(F.col("s_nationkey").alias("nationkey")))
    return a.intersect(b).orderBy("nationkey")


_SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 0
ORDER BY nationkey
"""


def setop_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset intersect keeps duplicate multiplicity."""
    a = (tbl(spark, sf, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nationkey")))
    b = (tbl(spark, sf, "supplier").crossJoin(
        local_df(
            spark,
            [("AUTOMOBILE",), ("BUILDING",)], ["seg"]))
        .select("seg", F.col("s_nationkey").alias("nationkey")))
    return (a.intersectAll(b)
            .groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("seg"))


_SET_INTERSECT_ALL_SQL = """
SELECT seg, COUNT(*) AS n FROM (
  SELECT c_mktsegment AS seg, c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT seg, s_nationkey
  FROM supplier CROSS JOIN (VALUES ('AUTOMOBILE'), ('BUILDING')) AS v(seg)
) t GROUP BY seg ORDER BY seg
"""


def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    """Customers with no recent order (set difference). Key domain is
    custkey, whose cardinality scales with SF, so the difference stays
    genuinely non-empty at every scale (nation-level EXCEPT saturates:
    suppliers cover all 25 nations past sf0.01)."""
    cust = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"))
    recent = (tbl(spark, sf, "orders")
              .where(F.col("o_orderdate") >= "2000-07-01")
              .select(F.col("o_custkey").alias("custkey")))
    return (cust.distinct().exceptAll(recent.distinct())
            .orderBy("custkey"))


_SET_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
ORDER BY custkey
"""


def setop_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset difference: customer-nation multiplicity minus supplier-
    nation multiplicity."""
    return (_cust_keys(spark, sf).exceptAll(_supp_keys(spark, sf))
            .groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("nationkey"))


_SET_EXCEPT_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
) t GROUP BY nationkey ORDER BY nationkey
"""


def setop_concat_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """concat(axis=0) with mismatched columns (reference
    bodo/pandas/base.py:588 -> unionByName allowMissingColumns)."""
    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"),
        F.lit("cust").alias("src"))
    s = tbl(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supp").alias("src"),
        F.col("s_name").alias("name"))
    u = c.unionByName(s, allowMissingColumns=True)
    return (u.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("bal").alias("n_bal"),
        F.count("name").alias("n_name"))
        .orderBy("src"))


_SET_CONCAT_SQL = """
SELECT src, COUNT(*) AS n, COUNT(bal) AS n_bal, COUNT(name) AS n_name
FROM (
  SELECT c_custkey AS key, c_acctbal AS bal, 'cust' AS src, NULL AS name
  FROM customer
  UNION ALL
  SELECT s_suppkey, NULL, 'supp', s_name FROM supplier
) u GROUP BY src ORDER BY src
"""


QUERIES: dict[str, QueryDef] = {
    "setop_union_all": QueryDef(setop_union_all, _SET_UNION_ALL_SQL),
    "setop_union_distinct": QueryDef(setop_union_distinct, _SET_UNION_D_SQL),
    "setop_intersect": QueryDef(setop_intersect, _SET_INTERSECT_SQL),
    "setop_intersect_all": QueryDef(setop_intersect_all, _SET_INTERSECT_ALL_SQL),
    "setop_except": QueryDef(setop_except, _SET_EXCEPT_SQL),
    "setop_except_all": QueryDef(setop_except_all, _SET_EXCEPT_ALL_SQL),
    "setop_concat_by_name": QueryDef(setop_concat_by_name, _SET_CONCAT_SQL),
}
