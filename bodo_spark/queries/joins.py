"""Join battery (SURVEY.md 2.3): all join types incl. semi/anti/full,
non-equi range joins, and the as-of join custom operator.

Reference parity: streaming partitioned hash join w/ adaptive broadcast
(reference bodo/libs/streaming/_join.cpp, _join.h:1377) -> Spark
BHJ/SMJ/SHJ + AQE; interval joins (reference bodo/libs/_interval_join.cpp)
-> range-predicate joins; merge_asof (reference
bodo/hiframes/dataframe_impl.py:3768) -> bodo_spark.operators.asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, dec, dsum, tbl


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi (EXISTS): customers that have orders, per segment."""
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_with_orders"))
            .orderBy("c_mktsegment"))


_JOIN_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_with_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti (NOT EXISTS): customers with no 1998+ orders, per nation.

    Scoped to recent orders so the anti-join has genuine misses at every
    SF (every customer has SOME order in the synthetic data, which made
    the unscoped variant a vacuous 0 == 0 check)."""
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_no_orders"))
            .orderBy("c_nationkey"))


_JOIN_ANTI_SQL = """
SELECT c_nationkey, COUNT(*) AS n_no_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    c = (tbl(spark, sf, "customer").groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_cust")))
    s = (tbl(spark, sf, "supplier").groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_supp")))
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return (j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
        .orderBy("nationkey"))


_JOIN_FULL_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""


def join_right_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Right outer join keeps all nations."""
    s = tbl(spark, sf, "supplier")
    n = tbl(spark, sf, "nation")
    return (s.join(n, s.s_nationkey == n.n_nationkey, "right")
            .groupBy("n_nationkey", "n_name")
            .agg(F.count("s_suppkey").alias("n_supp"))
            .orderBy("n_nationkey"))


_JOIN_RIGHT_SQL = """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_supp
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name ORDER BY n_nationkey
"""


def join_cross(spark: SparkSession, sf: str) -> DataFrame:
    """Cross join (reference LogicalCrossProduct, plan.py:436)."""
    r1 = tbl(spark, sf, "region").select(F.col("r_name").alias("r1"))
    r2 = tbl(spark, sf, "region").select(F.col("r_name").alias("r2"))
    return (r1.crossJoin(r2)
            .where(F.col("r1") < F.col("r2"))
            .orderBy("r1", "r2"))


_JOIN_CROSS_SQL = """
SELECT r1.r_name AS r1, r2.r_name AS r2
FROM region r1 CROSS JOIN region r2
WHERE r1.r_name < r2.r_name
ORDER BY r1, r2
"""


def join_range_events(spark: SparkSession, sf: str) -> DataFrame:
    """Equi + range predicate join (reference interval join,
    bodo/libs/_interval_join.cpp): clicks within 1 hour after a signup
    by the same user. Spark executes the equi part hashed, range as a
    join condition -- the scalable plan shape for point-in-interval."""
    e = tbl(spark, sf, "events")
    sign = (e.where(F.col("event_type") == "signup")
            .select(F.col("user_id").alias("s_uid"), F.col("ts").alias("s_ts"),
                    F.col("event_id").alias("s_eid")))
    click = (e.where(F.col("event_type") == "click")
             .select("user_id", "ts", "value"))
    cond = ((click.user_id == sign.s_uid)
            & (click.ts >= sign.s_ts)
            & (click.ts < sign.s_ts + F.expr("INTERVAL 1 HOUR")))
    return (sign.join(click, cond, "inner")
            .groupBy("s_uid")
            .agg(F.count(F.lit(1)).alias("n_clicks_1h"),
                 dsum(dec("value", 12)).alias("sum_value"))
            .orderBy("s_uid"))


_JOIN_RANGE_SQL = """
SELECT s.user_id AS s_uid, COUNT(*) AS n_clicks_1h,
       CAST(SUM(CAST(c.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON c.user_id = s.user_id
 AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
GROUP BY s.user_id ORDER BY s_uid
"""


def join_asof_events(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (backward): each purchase matched to the same user's
    most recent prior-or-equal click. Uses the engine's merge_asof
    operator (bodo_spark.operators.asof; reference pd.merge_asof,
    bodo/hiframes/dataframe_impl.py:3768)."""
    from ..operators.asof import merge_asof

    e = tbl(spark, sf, "events")
    buys = (e.where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts"))
    # de-dup clicks per (user, ts) so the as-of match is unique
    clicks = (e.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id"),
                   F.max("value").alias("click_value")))
    j = merge_asof(buys, clicks, on="ts", by="user_id",
                   direction="backward")
    return (j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("click_id").alias("n_matched"),
        F.max("click_id").alias("max_click_id"),
        dsum(dec("click_value", 12)).alias("sum_click_value"))
        .orderBy("user_id"))


_JOIN_ASOF_SQL = """
WITH buys AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT b.user_id AS user_id, COUNT(*) AS n_purchases,
       COUNT(click_id) AS n_matched, MAX(click_id) AS max_click_id,
       CAST(SUM(CAST(click_value AS DECIMAL(12,2))) AS DOUBLE) AS sum_click_value
FROM buys b ASOF LEFT JOIN clicks c
  ON b.user_id = c.user_id AND b.ts >= c.ts
GROUP BY b.user_id ORDER BY user_id
"""


def join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join, direction='nearest' with allow_exact_matches=False:
    each purchase matched to the same user's closest click at a strictly
    different timestamp (distance ties prefer the earlier click, the
    pandas tie rule). Exercises both round-5 merge_asof extensions."""
    from ..operators.asof import merge_asof

    e = tbl(spark, sf, "events")
    buys = (e.where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts"))
    clicks = (e.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id"),
                   F.max("value").alias("click_value")))
    j = merge_asof(buys, clicks, on="ts", by="user_id",
                   direction="nearest", allow_exact_matches=False)
    return (j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("click_id").alias("n_matched"),
        F.max("click_id").alias("max_click_id"),
        dsum(dec("click_value", 12)).alias("sum_click_value"))
        .orderBy("user_id"))


_JOIN_ASOF_NEAREST_SQL = """
WITH buys AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT b.user_id AS user_id, COUNT(*) AS n_purchases,
       COUNT(m.click_id) AS n_matched, MAX(m.click_id) AS max_click_id,
       CAST(SUM(CAST(m.click_value AS DECIMAL(12,2))) AS DOUBLE) AS sum_click_value
FROM buys b LEFT JOIN LATERAL (
  SELECT c.click_id, c.click_value FROM clicks c
  WHERE c.user_id = b.user_id AND c.ts <> b.ts
  ORDER BY abs(epoch_us(c.ts) - epoch_us(b.ts)), c.ts LIMIT 1) m ON TRUE
GROUP BY b.user_id ORDER BY user_id
"""


def join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join (reference bodo/libs/_interval_join.cpp
    merge at :335): same-customer order pairs whose 30-day validity
    windows [date, date+30) overlap. Equi part (customer) hashes; the
    overlap predicate filters pairs."""
    o = tbl(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d0"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("d1"))
    a = o.select(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("k_a"),
                 F.col("d0").alias("a0"), F.col("d1").alias("a1"))
    b = o.select(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("k_b"),
                 F.col("d0").alias("b0"), F.col("d1").alias("b1"))
    pairs = (a.join(b, "ck")
             .where((F.col("k_a") < F.col("k_b"))
                    & (F.col("a0") < F.col("b1")) & (F.col("b0") < F.col("a1"))))
    return (pairs.groupBy("ck").agg(F.count(F.lit(1)).alias("n_overlaps"))
            .orderBy("ck"))


_JOIN_OVERLAP_SQL = """
WITH o AS (
  SELECT o_custkey AS ck, o_orderkey,
         CAST(o_orderdate AS DATE) AS d0,
         CAST(o_orderdate AS DATE) + 30 AS d1
  FROM orders)
SELECT a.ck AS ck, COUNT(*) AS n_overlaps
FROM o a JOIN o b
  ON a.ck = b.ck AND a.o_orderkey < b.o_orderkey
 AND a.d0 < b.d1 AND b.d0 < a.d1
GROUP BY a.ck ORDER BY a.ck
"""


def join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit broadcast-hash join of fact x small dim (reference
    adaptive broadcast decision _join.h:1377 -> F.broadcast hint).

    The static hint is only placed on ``nation`` — a fixed-cardinality
    dimension (25 rows at every scale factor). SF-scaled tables
    (customer/supplier/part) must never carry a static broadcast hint:
    AQE's dynamic decision picks BHJ for them when, and only when, the
    build side is actually small at runtime."""
    li = tbl(spark, sf, "lineitem")
    supp = tbl(spark, sf, "supplier")
    nat = tbl(spark, sf, "nation")
    return (li.join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(dsum(dec("l_extendedprice", 12)).alias("nation_revenue"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("n_name"))


_JOIN_BCAST_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS nation_revenue,
       COUNT(*) AS n
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=>) (reference equal_null kernel)."""
    e = tbl(spark, sf, "events")
    a = e.select(F.when(F.col("value") > 50, F.col("event_type"))
                 .alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n_a"))
    b = e.select(F.when(F.col("value") > 80, F.col("event_type"))
                 .alias("k2")).groupBy("k2").agg(F.count(F.lit(1)).alias("n_b"))
    return (a.join(b, a.k.eqNullSafe(b.k2), "inner")
            .select("k", "n_a", "n_b")
            .orderBy(F.col("k").asc_nulls_first()))


_JOIN_NULLSAFE_SQL = """
WITH a AS (
  SELECT CASE WHEN value > 50 THEN event_type END AS k, COUNT(*) AS n_a
  FROM events GROUP BY 1),
b AS (
  SELECT CASE WHEN value > 80 THEN event_type END AS k2, COUNT(*) AS n_b
  FROM events GROUP BY 1)
SELECT k, n_a, n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
ORDER BY k NULLS FIRST
"""


def join_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit key-salting (operators/skew.py salted_join) on a join
    whose key distribution is MADE skewed: ~70% of events collapse onto
    one hot key. The salted plan spreads the hot key over 8 sub-keys;
    results must equal the plain join, which is exactly what the oracle
    states (the oracle knows nothing about salt)."""
    from ..operators.skew import salted_join
    e = (tbl(spark, sf, "events")
         .withColumn("k", F.when(F.col("event_id") % 10 < 7, F.lit(1))
                     .otherwise(F.col("event_id") % 1000 + 2)))
    dim = (e.select("k").distinct()
           .withColumn("grp", F.pmod(F.col("k"), F.lit(7))))
    joined = salted_join(e, dim, "k", salt_n=8, how="inner")
    return (joined.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"))
            .orderBy("grp"))


_JOIN_SALTED_SQL = """
WITH e AS (
  SELECT CASE WHEN event_id % 10 < 7 THEN 1
              ELSE event_id % 1000 + 2 END AS k, value
  FROM events),
dim AS (SELECT DISTINCT k, k % 7 AS grp FROM e)
SELECT grp, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM e JOIN dim USING (k)
GROUP BY grp ORDER BY grp
"""


def join_two_stage_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-stage COUNT(DISTINCT) (operators/skew.py) under the
    gate: per event_type distinct users, hot key's value set spread
    over 32 sub-reducers; exact result, plain-SQL oracle."""
    from ..operators.skew import two_stage_distinct_count
    e = tbl(spark, sf, "events")
    return (two_stage_distinct_count(e, "event_type", "user_id",
                                     salt=32, out_col="n_users")
            .orderBy("event_type"))


_JOIN_TWO_STAGE_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def join_null_aware_anti(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-aware anti join (the reference's mark join, _join.h:276:
    NOT IN under 3VL): PROBE-side NULLs -- a NULL key's NOT IN is
    UNKNOWN, so those rows must be DROPPED (a naive LEFT ANTI
    translation would keep them: NULL matches nothing). A build-side
    NULL variant would legally return zero rows (x NOT IN (...NULL) is
    never TRUE) -- vacuous at the gate, so the probe side carries the
    NULLs instead and the result stays non-empty."""
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders")
    c.createOrReplaceTempView("_naa_cust")
    o.createOrReplaceTempView("_naa_ord")
    return spark.sql("""
        SELECT c_mktsegment AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_bal
        FROM _naa_cust
        WHERE CASE WHEN c_custkey % 89 = 0 THEN NULL
                   ELSE c_custkey END NOT IN (
            SELECT o_custkey FROM _naa_ord WHERE o_orderkey % 3 = 0)
        GROUP BY seg ORDER BY seg
    """)


_JOIN_NULL_AWARE_SQL = """
SELECT c_mktsegment AS seg, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM customer
WHERE CASE WHEN c_custkey % 89 = 0 THEN NULL ELSE c_custkey END NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0)
GROUP BY seg ORDER BY seg
"""


# --------------------------------------------------------------------------
# Hierarchy expansion (operators/hierarchy.expand_hierarchy): the
# WITH RECURSIVE workload via pointer doubling. A deterministic tree is
# derived from doc ids (parent = id // 3, root 0 -- depth ~8 at sf0.01);
# the engine resolves it in ~log2(depth) doubling joins while the
# oracle IS a real recursive CTE -- two formulations, one result.

def join_hierarchy_expand(spark: SparkSession, sf: str) -> DataFrame:
    """Per-depth node counts and id xors of the resolved forest."""
    from ..operators.hierarchy import expand_hierarchy
    d = tbl(spark, sf, "documents")
    edges = (d.where(F.col("doc_id") > 0)
             .select(F.col("doc_id").alias("child"),
                     F.floor(F.col("doc_id") / F.lit(3)).cast("long")
                     .alias("parent")))
    h = expand_hierarchy(edges)
    return (h.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.bit_xor("id").alias("id_xor"),
        F.bit_xor("root").alias("root_xor"))
        .orderBy("depth"))


_HIERARCHY_SQL = """
WITH RECURSIVE e AS (
  SELECT doc_id AS child, doc_id // 3 AS parent
  FROM documents WHERE doc_id > 0),
nodes AS (SELECT child AS id FROM e UNION SELECT parent FROM e),
rootset AS (
  SELECT id FROM nodes WHERE id NOT IN (SELECT child FROM e)),
up AS (
  SELECT id, id AS anc, CAST(0 AS BIGINT) AS depth FROM nodes
  UNION ALL
  SELECT u.id, e.parent, u.depth + 1
  FROM up u JOIN e ON u.anc = e.child),
final AS (
  -- DISTINCT: DuckDB multiplies the non-recursive base CTE's rows
  -- inside a WITH RECURSIVE block (observed 4x at v1.0); the terminal
  -- (id, root, depth) row is unique per id in a forest, so DISTINCT
  -- recovers the exact relation
  SELECT DISTINCT id, anc AS root, depth FROM up
  WHERE anc IN (SELECT id FROM rootset))
SELECT depth, COUNT(*) AS n_nodes, bit_xor(id) AS id_xor,
       bit_xor(root) AS root_xor
FROM final GROUP BY depth ORDER BY depth
"""


# --------------------------------------------------------------------------
# Record linkage (operators/linkage.fuzzy_join): a dirty feed of
# customer names -- one digit deleted mid-name for most rows, the head
# replaced by XXXX-noise for every 5th (same blocking tail, must FAIL
# the threshold) -- matched back to the clean master, blocked on the
# last-4-character tail. The oracle re-blocks, re-scores with DuckDB's
# own jaro_winkler_similarity (bit-matched kernel, integer-compared),
# re-thresholds and re-picks best matches.

def join_fuzzy_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy-join gate: match counts, key xors and the exact score
    mass of the best-match assignment."""
    from ..operators.linkage import fuzzy_join
    c = tbl(spark, sf, "customer")
    left = c.select(F.col("c_custkey").alias("lk"),
                    F.col("c_name").alias("lname"))
    dirty_name = (F.when(F.col("c_custkey") % 5 == 0,
                         F.concat(F.lit("XXXXXXXXXXXX"),
                                  F.substring(F.col("c_name"), -6, 6)))
                  .otherwise(F.concat(
                      F.substring(F.col("c_name"), 1, 9),
                      F.expr("substring(c_name, 11)"))))
    right = c.select((F.col("c_custkey") + 1_000_000).alias("rk"),
                     dirty_name.alias("rname"))
    out = fuzzy_join(left, right, left_key="lk", right_key="rk",
                     left_col="lname", right_col="rname",
                     left_block=F.substring(F.col("lname"), -4, 4),
                     right_block=F.substring(F.col("rname"), -4, 4),
                     threshold=0.9, keep="best")
    return (out.agg(F.count(F.lit(1)).alias("n_matched"),
                    F.bit_xor("lk").alias("lk_xor"),
                    F.bit_xor("rk").alias("rk_xor"),
                    F.sum("score100").cast("bigint").alias("score_mass")))


_FUZZY_LINKAGE_SQL = """
WITH L AS (SELECT c_custkey AS lk, c_name AS lname FROM customer),
R AS (
  SELECT c_custkey + 1000000 AS rk,
         CASE WHEN c_custkey % 5 = 0
              THEN 'XXXXXXXXXXXX' || substr(c_name, length(c_name) - 5, 6)
              ELSE substr(c_name, 1, 9) || substr(c_name, 11) END
           AS rname
  FROM customer),
cand AS (
  SELECT lk, rk, lname, rname
  FROM L JOIN R
    ON substr(lname, length(lname) - 3, 4)
       = substr(rname, length(rname) - 3, 4)),
scored AS (
  SELECT lk, rk,
         CAST(floor(100 * jaro_winkler_similarity(lname, rname) + 0.5)
              AS INT) AS score100
  FROM cand),
kept AS (SELECT * FROM scored WHERE score100 >= 90),
best AS (
  SELECT lk, rk, score100 FROM (
    SELECT *, row_number() OVER (PARTITION BY lk
                                 ORDER BY score100 DESC, rk) AS rn
    FROM kept) WHERE rn = 1)
SELECT COUNT(*) AS n_matched, bit_xor(lk) AS lk_xor,
       bit_xor(rk) AS rk_xor,
       CAST(SUM(score100) AS BIGINT) AS score_mass
FROM best
"""


# --------------------------------------------------------------------------
# Multi-parent DAG expansion / BOM explosion (operators/hierarchy
# .expand_dag): each part k < 500 is assembled into parents k//2 (qty
# k%5+1) AND k//3 (qty k%7+1) -- a true multi-parent DAG (parallel
# edges included at k=3) where quantities multiply along paths and
# roll up per (part, ancestor-assembly). The engine runs stratified
# pointer doubling (log-depth); the oracle IS a real DuckDB recursive
# CTE enumerating every path. The full (d, a, n_paths, total_qty)
# relation is pinned per ancestor bucket via sorted row hashes.

def join_bom_explode(spark: SparkSession, sf: str) -> DataFrame:
    """BOM explosion gate: per ancestor bucket -- pair count, path
    count mass, rolled-up quantity mass, order-insensitive md5 over
    every (part, ancestor, n_paths, total_qty) row."""
    from ..operators.hierarchy import expand_dag
    p = (tbl(spark, sf, "part").select("p_partkey")
         .where(F.col("p_partkey") < 500))
    half = (p.where(F.col("p_partkey") >= 2)
            .select(F.col("p_partkey").cast("long").alias("child"),
                    F.floor(F.col("p_partkey") / 2).cast("long")
                    .alias("parent"),
                    (F.col("p_partkey") % 5 + 1).cast("long")
                    .alias("qty")))
    third = (p.where(F.col("p_partkey") >= 3)
             .select(F.col("p_partkey").cast("long").alias("child"),
                     F.floor(F.col("p_partkey") / 3).cast("long")
                     .alias("parent"),
                     (F.col("p_partkey") % 7 + 1).cast("long")
                     .alias("qty")))
    bom = expand_dag(half.unionByName(third), qty_col="qty")
    row = F.concat_ws(":", F.col("id").cast("string"),
                      F.col("anc").cast("string"),
                      F.col("n_paths").cast("string"),
                      F.col("total_qty").cast("string"))
    return (bom.groupBy((F.col("anc") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("n_paths").cast("bigint").alias("paths_sum"),
        F.sum("total_qty").cast("bigint").alias("qty_sum"),
        F.md5(F.array_join(F.array_sort(F.collect_list(F.md5(row))), ""))
        .alias("row_hash"))
        .orderBy("bucket"))


_BOM_SQL = """
WITH RECURSIVE edges AS (
  SELECT CAST(p_partkey AS BIGINT) AS child,
         CAST(p_partkey // 2 AS BIGINT) AS parent,
         CAST(p_partkey % 5 + 1 AS BIGINT) AS qty
  FROM part WHERE p_partkey >= 2 AND p_partkey < 500
  UNION ALL
  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey // 3 AS BIGINT),
         CAST(p_partkey % 7 + 1 AS BIGINT)
  FROM part WHERE p_partkey >= 3 AND p_partkey < 500),
paths AS (
  SELECT child AS d, parent AS a, qty AS qt FROM edges
  UNION ALL
  SELECT p.d, e.parent, p.qt * e.qty
  FROM paths p JOIN edges e ON p.a = e.child),
rel AS (
  SELECT d, a, CAST(COUNT(*) AS BIGINT) AS n_paths,
         CAST(SUM(qt) AS BIGINT) AS total_qty
  FROM paths GROUP BY d, a),
rowstr AS (
  SELECT a % 10 AS bucket, n_paths, total_qty,
         md5(concat_ws(':', CAST(d AS VARCHAR), CAST(a AS VARCHAR),
                       CAST(n_paths AS VARCHAR),
                       CAST(total_qty AS VARCHAR))) AS rh
  FROM rel)
SELECT bucket, COUNT(*) AS n_pairs,
       CAST(SUM(n_paths) AS BIGINT) AS paths_sum,
       CAST(SUM(total_qty) AS BIGINT) AS qty_sum,
       md5(string_agg(rh, '' ORDER BY rh)) AS row_hash
FROM rowstr GROUP BY bucket ORDER BY bucket
"""


QUERIES: dict[str, QueryDef] = {
    "join_bom_explode": QueryDef(
        join_bom_explode, _BOM_SQL,
        doc="multi-parent DAG / BOM explosion with quantity roll-up "
            "vs a real recursive-CTE oracle"),
    "join_fuzzy_linkage": QueryDef(join_fuzzy_linkage,
                                   _FUZZY_LINKAGE_SQL),
    "join_hierarchy_expand": QueryDef(join_hierarchy_expand,
                                      _HIERARCHY_SQL),
    "join_null_aware_anti": QueryDef(join_null_aware_anti,
                                     _JOIN_NULL_AWARE_SQL),
    "join_salted_skew": QueryDef(join_salted_skew, _JOIN_SALTED_SQL),
    "join_two_stage_distinct": QueryDef(join_two_stage_distinct,
                                        _JOIN_TWO_STAGE_SQL),
    "join_semi": QueryDef(join_semi, _JOIN_SEMI_SQL),
    "join_anti": QueryDef(join_anti, _JOIN_ANTI_SQL),
    "join_full_outer": QueryDef(join_full_outer, _JOIN_FULL_SQL),
    "join_right_outer": QueryDef(join_right_outer, _JOIN_RIGHT_SQL),
    "join_cross": QueryDef(join_cross, _JOIN_CROSS_SQL),
    "join_range_events": QueryDef(join_range_events, _JOIN_RANGE_SQL),
    "join_asof_events": QueryDef(join_asof_events, _JOIN_ASOF_SQL),
    "join_asof_nearest": QueryDef(join_asof_nearest, _JOIN_ASOF_NEAREST_SQL),
    "join_interval_overlap": QueryDef(join_interval_overlap, _JOIN_OVERLAP_SQL),
    "join_broadcast_dim": QueryDef(join_broadcast_dim, _JOIN_BCAST_SQL),
    "join_null_safe": QueryDef(join_null_safe, _JOIN_NULLSAFE_SQL),
}
