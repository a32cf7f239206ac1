"""TPC-H-derived query battery, adapted to the driver's reduced schema.

Reference parity: the reference ships all 22 TPC-H queries as its own
end-to-end correctness suite (reference BodoSQL/bodosql/tests/
test_tpch_first_half.py, bodo/tests/test_df_lib/test_tpch.py:39). The
driver's synthetic tables lack partsupp and several columns
(l_commitdate, o_shippriority, ...), so queries are adapted: same
operator shapes (scan -> filter -> join tree -> agg -> sort/limit),
filters retargeted to existing columns.

Determinism: see _util docstring -- decimal-exact aggregation, string
dates, tiebreaker columns on every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ._util import QueryDef, davg, dec, dsum, fmt_date, one, tbl

# exact decimal building blocks (see _util: inputs are 2-decimal doubles);
# functions, not module constants: pyspark Columns need an active session.
def _disc_price():
    # DECIMAL(8,2) * DECIMAL(4,2) -> DECIMAL(13,4): compact-long arithmetic
    return dec("l_extendedprice", 8) * (one() - dec("l_discount", 3))


def _charge():
    # DECIMAL(13,4) * DECIMAL(4,2) -> DECIMAL(18,6): exactly at the
    # compact-long threshold; one more digit would fall off the fast path
    return (dec("l_extendedprice", 8) * (one() - dec("l_discount", 3))
            * (one() + dec("l_tax", 3)))

_SQL_DISC_PRICE = ("CAST(l_extendedprice AS DECIMAL(12,2)) * "
                   "(1 - CAST(l_discount AS DECIMAL(12,2)))")
_SQL_CHARGE = _SQL_DISC_PRICE + " * (1 + CAST(l_tax AS DECIMAL(12,2)))"


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1. Single scan -> partial+final hash agg; no shuffle besides
    the 6-group exchange. Reference: bodo/tests/test_df_lib/test_tpch.py Q1."""
    l = tbl(spark, sf, "lineitem").where(F.col("l_shipdate") <= "2001-09-01")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity", 4)).alias("sum_qty"),
            dsum(dec("l_extendedprice", 8)).alias("sum_base_price"),
            dsum(_disc_price()).alias("sum_disc_price"),
            dsum(_charge()).alias("sum_charge"),
            davg(dec("l_quantity", 4), F.count("l_quantity")).alias("avg_qty"),
            davg(dec("l_extendedprice", 8),
                 F.count("l_extendedprice")).alias("avg_price"),
            davg(dec("l_discount", 3), F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q2_min_acctbal_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: per qualifying part, the supplier
    with minimum acctbal among suppliers that shipped it. Demonstrates the
    min-row-number-filter pattern (reference MinRowNumberFilterRule,
    BodoSQL/.../BodoPhysicalMinRowNumberFilter.kt) via a window + rn=1."""
    part = tbl(spark, sf, "part").where(
        (F.col("p_size") == 10) & (F.col("p_type") == "ECONOMY"))
    li = tbl(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = tbl(spark, sf, "supplier")
    joined = (part.join(li, part.p_partkey == li.l_partkey)
              .join(supp, li.l_suppkey == supp.s_suppkey))
    w = W.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
            .orderBy("p_partkey"))


_Q2_SQL = """
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM part
JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size = 10 AND p_type = 'ECONOMY'
QUALIFY row_number() OVER (PARTITION BY p_partkey
                           ORDER BY s_acctbal ASC, s_suppkey ASC) = 1
ORDER BY p_partkey
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3: 3-way join, agg, top-10. customer is small -> broadcast.

    Groups on the RAW date and formats to string after the aggregate:
    'yyyy-MM-dd' is injective on dates so the groups are identical, but
    the per-row pre-shuffle key stays a 4-byte date instead of a
    formatted string (narrower shuffle, no per-row formatting -- the
    r6 verdict's q3-vs-handwritten plan-delta audit traced the gap to
    exactly this)."""
    cust = tbl(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf, "orders").where(F.col("o_orderdate") < "1998-06-01")
    li = tbl(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_disc_price()).alias("revenue"))
        .select("l_orderkey", fmt_date("o_orderdate").alias("o_orderdate"),
                "o_orderpriority", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4: EXISTS -> left-semi join with a non-equi condition
    (l_shipdate > o_orderdate + 20 days replaces commit/receipt lateness)."""
    orders = tbl(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01"))
    li = tbl(spark, sf, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & \
        (li.l_shipdate > F.date_add(orders.o_orderdate, 20))
    return (orders.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 20 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5: 6-way join through region; dims broadcast, fact shuffles once."""
    region = tbl(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation = tbl(spark, sf, "nation")
    cust = tbl(spark, sf, "customer")
    supp = tbl(spark, sf, "supplier")
    orders = tbl(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    li = tbl(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp,
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


_Q5_SQL = f"""
SELECT n_name, CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+global agg; all predicates push to parquet."""
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(
        dsum(dec("l_extendedprice", 8) * dec("l_discount", 3)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: nation-pair volume by ship year."""
    n1 = tbl(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = tbl(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    supp = tbl(spark, sf, "supplier")
    cust = tbl(spark, sf, "customer")
    orders = tbl(spark, sf, "orders")
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    pairs = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") \
        | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .where(pairs)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         {_SQL_DISC_PRICE} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8: market share of one nation inside a region, by year."""
    region = tbl(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    nation_c = tbl(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    nation_s = tbl(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cust = tbl(spark, sf, "customer")
    supp = tbl(spark, sf, "supplier")
    orders = tbl(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    li = tbl(spark, sf, "lineitem")
    part = tbl(spark, sf, "part").where(F.col("p_type") == "STANDARD")
    vol = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == nation_c.cn_key)
        .join(F.broadcast(nation_s), supp.s_nationkey == nation_s.sn_key)
        .join(F.broadcast(region), nation_c.cn_region == region.r_regionkey)
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                _disc_price().alias("volume"), F.col("supp_nation"))
    )
    return (vol.groupBy("o_year")
            .agg((F.sum(F.when(F.col("supp_nation") == "NATION_3",
                               F.col("volume"))).cast("double")
                  / F.sum("volume").cast("double")).alias("mkt_share"))
            .orderBy("o_year"))


_Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         {_SQL_DISC_PRICE} AS volume, n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q9_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape without ps_supplycost: amount = disc price minus
    retail cost of the quantity."""
    part = tbl(spark, sf, "part").where(F.col("p_name").contains("widget"))
    supp = tbl(spark, sf, "supplier")
    nation = tbl(spark, sf, "nation")
    li = tbl(spark, sf, "lineitem")
    amount = _disc_price() - dec("p_retailprice", 6) * dec("l_quantity", 4)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
       CAST(SUM({_SQL_DISC_PRICE}
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns, top 20 customers."""
    cust = tbl(spark, sf, "customer")
    orders = tbl(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01"))
    li = tbl(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    nation = tbl(spark, sf, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape without partsupp: parts whose lineitem value
    exceeds a fraction of the global total (scalar-subquery threshold
    over a grouped aggregate)."""
    li = tbl(spark, sf, "lineitem")
    value = dec("l_extendedprice", 8) * dec("l_quantity", 4)
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(value).alias("value_dec")))
    # Scale-invariant threshold: 1.5x the AVERAGE per-part value (the
    # spec's fixed fraction-of-total goes empty once partkey cardinality
    # scales past 1/fraction; avg-relative keeps a stable ~1-2% of parts
    # at every SF -- verified 0.001/0.01/0.1).
    total = per_part.agg(
        (F.avg(F.col("value_dec").cast("double")) * 1.5).alias("threshold"))
    return (per_part.join(F.broadcast(total))
            .where(F.col("value_dec").cast("double") > F.col("threshold"))
            .select("l_partkey",
                    F.col("value_dec").cast("double").alias("part_value"))
            .orderBy(F.col("part_value").desc(), "l_partkey"))


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS value_dec
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT AVG(CAST(value_dec AS DOUBLE)) * 1.5 FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


def q12_shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: lateness buckets (no l_shipmode column; bucket on
    ship delay) x order priority counts."""
    orders = tbl(spark, sf, "orders")
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay <= 30, "FAST").when(delay <= 90, "NORMAL")
              .otherwise("SLOW"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (j.groupBy(bucket.alias("ship_bucket"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_bucket"))


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY ship_bucket
"""


def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: left outer join + double aggregation."""
    cust = tbl(spark, sf, "customer")
    orders = tbl(spark, sf, "orders").where(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio."""
    part = tbl(spark, sf, "part")
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01"))
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        (F.lit(100.0)
         * F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())).cast("double")
         / F.sum(_disc_price()).cast("double")).alias("promo_revenue"))


_Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC_PRICE} END) AS DOUBLE)
       / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-subquery max selection."""
    supp = tbl(spark, sf, "supplier")
    # Explicit isnotnull(l_suppkey): the supplier join infers it on ITS
    # branch only, which would make the two `rev` scan subtrees differ
    # and defeat ReuseExchange -- with it shared, the lineitem
    # scan+partial-agg+shuffle runs ONCE for both the join and the
    # MAX scalar subquery (verified: ReusedExchange in the final plan).
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
        & F.col("l_suppkey").isNotNull())
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dsum(_disc_price()).alias("total_revenue")))
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.m)
            .join(supp, rev.supplier_no == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute group."""
    part = tbl(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 10, 15, 20)))
    li = tbl(spark, sf, "lineitem")
    return (li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"))


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17: correlated avg subquery -> per-part pre-agg + join.
    avg computed as exact-decimal-sum / count (double) on both sides."""
    li = tbl(spark, sf, "lineitem")
    part = tbl(spark, sf, "part").where(F.col("p_brand") == "Brand#3")
    # The correlated avg only matters for brand parts (part determines
    # brand, so a brand part's lineitems are unaffected by the filter):
    # joining part BEFORE the aggregate shrinks the big agg's input ~25x
    # and lets the runtime bloom filter prune the lineitem scan. AQE
    # picks the join strategy (no static broadcast: part is SF-scaled).
    brand_keys = part.select(F.col("p_partkey").alias("pk"))
    per_part = (li.join(brand_keys, li.l_partkey == F.col("pk"))
                .groupBy("pk")
                .agg((F.sum(dec("l_quantity", 4)).cast("double")
                      / F.count("l_quantity")).alias("avg_qty")))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(per_part, li.l_partkey == per_part.pk)
            .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg((F.sum(dec("l_extendedprice", 8)).cast("double") / 7.0)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


_Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty
"""


def q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18: HAVING on join-side agg, top-100."""
    li = tbl(spark, sf, "lineitem")
    orders = tbl(spark, sf, "orders")
    cust = tbl(spark, sf, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(dsum(dec("l_quantity", 4)).alias("sum_qty"))
           .where(F.col("sum_qty") > 300))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    fmt_date("o_orderdate").alias("o_orderdate"),
                    "o_totalprice", "sum_qty")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(100))


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs join predicate."""
    li = tbl(spark, sf, "lineitem")
    part = tbl(spark, sf, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.where(cond).agg(dsum(_disc_price()).alias("revenue"),
                             F.count(F.lit(1)).alias("n_lines"))


_Q19_SQL = f"""
SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_part_promotion_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain -- suppliers that shipped
    above-median volume of PROMO parts in a year."""
    part = tbl(spark, sf, "part").where(F.col("p_type") == "PROMO")
    li = tbl(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    supp = tbl(spark, sf, "supplier")
    nation = tbl(spark, sf, "nation").where(F.col("n_name") == "NATION_4")
    vol = (li.join(part, li.l_partkey == part.p_partkey)
           .groupBy("l_suppkey")
           .agg(dsum(dec("l_quantity", 4)).alias("qty"))
           .where(F.col("qty") > 100))
    return (supp.join(vol, supp.s_suppkey == vol.l_suppkey, "left_semi")
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey,
                  "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 100)
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_4')
ORDER BY s_suppkey
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: exists + not-exists over same-order other-supplier
    lines; lateness = shipped >60 days after order date."""
    li = tbl(spark, sf, "lineitem")
    orders = tbl(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    supp = tbl(spark, sf, "supplier")
    nation = tbl(spark, sf, "nation").where(F.col("n_name") == "NATION_0")
    # Group-then-join rewrite of the exists/not-exists pair: ONE
    # lineitem-orders join computes per-order (distinct suppliers,
    # distinct LATE suppliers); a late line waits iff its order has
    # another supplier (n_supp > 1: the EXISTS) and no OTHER late
    # supplier (n_late_supp == 1: the NOT EXISTS -- this line's supplier
    # is late, so any second late supplier disqualifies). The classic
    # plan scans lineitem 3x (l1/semi/anti); this scans it once, and the
    # groupBy + join-back both reuse the join's orderkey partitioning.
    # (EXISTS-l2 over ALL orders equals EXISTS over 'F' orders here:
    # l2 shares l1's orderkey, and l1's order is 'F'.)
    # explicit notnulls: the late-filter branch would otherwise infer
    # them on only ITS scan subtree and defeat exchange reuse (same
    # pattern as q15)
    li = li.where(F.col("l_shipdate").isNotNull()
                  & F.col("l_suppkey").isNotNull())
    orders = orders.where(F.col("o_orderdate").isNotNull())
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select(F.col("l_orderkey").alias("ok"),
                 F.col("l_suppkey").alias("sk"),
                 (F.col("l_shipdate")
                  > F.date_add(F.col("o_orderdate"), 60)).alias("late")))
    # Two-stage distinct: rolling up to (order, supplier) first replaces
    # the twin countDistinct (whose Expand doubles the join output) with
    # plain partial-aggregating counts, and shrinks the join-back input
    # from lines to supplier-orders. late_lines preserves line-level
    # numwait multiplicity. Every stage (both groupBys and the join-back)
    # reuses the li-orders join's orderkey hash partitioning -- one
    # lineitem scan, one shuffle after it.
    per = j.groupBy("ok", "sk").agg(
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_lines"))
    g = per.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("late_lines") > 0, 1).otherwise(0))
        .alias("n_late_supp"))
    waiting = (per.where(F.col("late_lines") > 0)
               .join(g, "ok")
               .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)))
    return (waiting.join(supp, F.col("sk") == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey,
                  "left_semi")
            .groupBy("s_name")
            .agg(F.sum("late_lines").cast("bigint").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_0')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22: scalar subquery threshold + anti join."""
    cust = tbl(spark, sf, "customer")
    orders = tbl(spark, sf, "orders")
    pos = cust.where(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg((F.sum(dec("c_acctbal", 6)).cast("double")
                       / F.count("c_acctbal")).alias("ab"))
    # Anti-join against RECENT orders (spec's "no orders in 7 years"
    # clause): on this data every customer has some order, so the
    # unrestricted anti join is vacuously empty at every SF.
    recent = orders.where(F.col("o_orderdate") >= "2000-01-01")
    return (cust.join(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("ab"))
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum(dec("c_acctbal", 6)).alias("totacctbal"))
            .orderBy("cntrycode"))


_Q22_SQL = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


QUERIES: dict[str, QueryDef] = {
    "q1_pricing_summary": QueryDef(q1_pricing_summary, _Q1_SQL),
    "q2_min_acctbal_supplier": QueryDef(q2_min_acctbal_supplier, _Q2_SQL),
    "q3_shipping_priority": QueryDef(q3_shipping_priority, _Q3_SQL),
    "q4_order_priority": QueryDef(q4_order_priority, _Q4_SQL),
    "q5_local_supplier_volume": QueryDef(q5_local_supplier_volume, _Q5_SQL),
    "q6_forecast_revenue": QueryDef(q6_forecast_revenue, _Q6_SQL),
    "q7_volume_shipping": QueryDef(q7_volume_shipping, _Q7_SQL),
    "q8_market_share": QueryDef(q8_market_share, _Q8_SQL),
    "q9_profit_by_nation_year": QueryDef(q9_profit_by_nation_year, _Q9_SQL),
    "q10_returned_items": QueryDef(q10_returned_items, _Q10_SQL),
    "q11_important_parts": QueryDef(q11_important_parts, _Q11_SQL),
    "q12_shipmode_priority": QueryDef(q12_shipmode_priority, _Q12_SQL),
    "q13_customer_distribution": QueryDef(q13_customer_distribution, _Q13_SQL),
    "q14_promo_revenue": QueryDef(q14_promo_revenue, _Q14_SQL),
    "q15_top_supplier": QueryDef(q15_top_supplier, _Q15_SQL),
    "q16_supplier_part_counts": QueryDef(q16_supplier_part_counts, _Q16_SQL),
    "q17_small_quantity_revenue": QueryDef(q17_small_quantity_revenue, _Q17_SQL),
    "q18_large_volume_customer": QueryDef(q18_large_volume_customer, _Q18_SQL),
    "q19_discounted_revenue": QueryDef(q19_discounted_revenue, _Q19_SQL),
    "q20_part_promotion_suppliers": QueryDef(q20_part_promotion_suppliers, _Q20_SQL),
    "q21_suppliers_kept_waiting": QueryDef(q21_suppliers_kept_waiting, _Q21_SQL),
    "q22_global_sales_opportunity": QueryDef(q22_global_sales_opportunity, _Q22_SQL),
}
