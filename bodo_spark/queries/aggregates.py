"""Aggregation battery (SURVEY.md 2.4): the reference's 72-ftype matrix
(reference bodo/libs/groupby/_groupby_ftypes.h:17-110) re-expressed with
built-in Spark aggregates.

Determinism notes:
  - var/std are computed from exact decimal sums (sum, sum-of-squares,
    count) with the final arithmetic in double -- both engines do the
    identical double ops, so results match bitwise. Built-in VAR_SAMP
    would differ in low bits (different accumulation orders).
  - listagg/collect_* are emitted sorted so the string is deterministic.
  - percentile_cont interpolation on integer-valued quantities is exact
    in double on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, dec, dsum, tbl


def agg_variance_stats(spark: SparkSession, sf: str) -> DataFrame:
    """var/std/skew-inputs via exact sums (reference: var/std(+pop)
    ftypes)."""
    li = tbl(spark, sf, "lineitem")
    x = dec("l_extendedprice", 12)
    g = li.groupBy("l_returnflag").agg(
        F.count("l_extendedprice").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(30,4)")).cast("double").alias("sx2"),
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    return g.select(
        "l_returnflag", "n",
        ((sx2 - sx * sx / n) / (n - 1)).alias("var_samp"),
        ((sx2 - sx * sx / n) / n).alias("var_pop"),
        F.sqrt((sx2 - sx * sx / n) / (n - 1)).alias("std_samp"),
        (sx / n).alias("mean"),
    ).orderBy("l_returnflag")


_AGG_VAR_SQL = """
WITH g AS (
  SELECT l_returnflag, COUNT(l_extendedprice) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4)))
              AS DOUBLE) AS sx2
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (sx2 - sx * sx / n) / (n - 1) AS var_samp,
       (sx2 - sx * sx / n) / n AS var_pop,
       sqrt((sx2 - sx * sx / n) / (n - 1)) AS std_samp,
       sx / n AS mean
FROM g ORDER BY l_returnflag
"""


def agg_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """count_if / bool_and / bool_or (reference boolXX_agg, count_if
    ftypes)."""
    e = tbl(spark, sf, "events")
    return (e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 10.0).alias("n_big"),
        F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99.0).alias("any_huge"),
        F.count(F.lit(1)).alias("n"))
        .orderBy("event_type"))


_AGG_COND_SQL = """
SELECT event_type,
       CAST(count_if(value > 10.0) AS BIGINT) AS n_big,
       bool_and(value >= 0.0) AS all_nonneg,
       bool_or(value > 99.0) AS any_huge,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def agg_distinct_counts(spark: SparkSession, sf: str) -> DataFrame:
    """nunique / count distinct, incl. multi-column."""
    li = tbl(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
        F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag"))


_AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_minmax_first(spark: SparkSession, sf: str) -> DataFrame:
    """min/max over numerics and strings + min_by/max_by (any_value
    analogue with deterministic tiebreak via unique o_orderkey)."""
    o = tbl(spark, sf, "orders")
    return (o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
        F.min_by("o_orderkey", "o_orderkey").alias("first_key"),
        F.max_by("o_orderkey", "o_orderkey").alias("last_key"))
        .orderBy("o_orderstatus"))


_AGG_MINMAX_SQL = """
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio,
       min_by(o_orderkey, o_orderkey) AS first_key,
       max_by(o_orderkey, o_orderkey) AS last_key
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def agg_listagg_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """listagg / array_agg / collect_set (reference listagg, array_agg
    ftypes) -- sorted for determinism."""
    c = tbl(spark, sf, "customer")
    return (c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",")
        .alias("segments"),
        F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        F.count(F.lit(1)).alias("n"))
        .orderBy("c_nationkey"))


_AGG_LISTAGG_SQL = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """median / percentile_cont / percentile_disc (reference
    percentile_cont/disc ftypes; t-digest is the approx path --
    bodo/libs/_bodo_tdigest.cpp; exact here)."""
    li = tbl(spark, sf, "lineitem")
    return (li.groupBy("l_linestatus").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.expr("percentile(l_quantity, array(0.1))[0]").alias("p10"))
        .orderBy("l_linestatus"))


_AGG_PCT_SQL = """
SELECT l_linestatus,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.75) AS q75,
       quantile_cont(l_quantity, 0.1) AS p10
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP with grouping() flags (reference grouping-sets streaming op,
    streaming/groupby.py:44-123)."""
    li = tbl(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(dec("l_quantity", 12)).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls")))


_AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = tbl(spark, sf, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum(dec("o_totalprice", 12)).alias("sum_price"),
        F.count(F.lit(1)).alias("n")))


_AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (parity: reference
    grouping_sets_* streaming entry points)."""
    tbl(spark, sf, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


_AGG_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (reference dataframe_pass.py:651, SQL PIVOT tests)."""
    li = tbl(spark, sf, "lineitem")
    p = (li.groupBy("l_returnflag")
         .pivot("l_linestatus", ["O", "F"])
         .agg(F.sum(dec("l_quantity", 12)).cast("double")))
    return (p.select("l_returnflag",
                     F.col("O").alias("qty_o"), F.col("F").alias("qty_f"))
            .orderBy("l_returnflag"))


_AGG_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt (reference melt via stack)."""
    p = tbl(spark, sf, "part")
    up = p.unpivot(
        ids=["p_partkey"],
        values=[F.col("p_size").cast("double").alias("p_size"),
                F.col("p_retailprice").alias("p_retailprice")],
        variableColumnName="attr", valueColumnName="val")
    return (up.groupBy("attr").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("val", 12)).alias("sum_val"))
        .orderBy("attr"))


_AGG_UNPIVOT_SQL = """
SELECT attr, COUNT(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
FROM (
  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
) u
GROUP BY attr ORDER BY attr
"""


def agg_width_bucket_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """width_bucket histogram of account balances."""
    c = tbl(spark, sf, "customer")
    return (c.groupBy(
        F.width_bucket("c_acctbal", F.lit(0.0), F.lit(10000.0), F.lit(10))
        .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket"))


# DuckDB has no width_bucket; mirror Spark's formula
# bucket = floor((x - min) * n / (max - min)) + 1 with under/overflow rails
_AGG_WB_SQL = """
SELECT CASE WHEN c_acctbal < 0.0 THEN 0
            WHEN c_acctbal >= 10000.0 THEN 11
            ELSE CAST(FLOOR((c_acctbal - 0.0) * 10 / (10000.0 - 0.0)) AS BIGINT) + 1
       END AS bucket, COUNT(*) AS n
FROM customer GROUP BY 1 ORDER BY bucket
"""


def agg_skew_kurt_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Skewness/kurtosis from exact decimal moment sums (reference skew/
    kurtosis ftypes). Built-in skewness()/kurtosis() accumulate floats
    in partition order (non-deterministic across engines); raw moments
    over DECIMAL are exact, and the final double algebra is identical on
    both sides."""
    e = tbl(spark, sf, "events")
    x = dec("value", 12)
    g = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(30,4)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(38,6)")).cast("double").alias("s3"),
        F.sum(((x * x).cast("decimal(30,4)") * (x * x).cast("decimal(30,4)"))
              .cast("decimal(38,8)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * s2 / n + 2 * m * m * m
    m4 = (s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n - 3 * m * m * m * m)
    return g.select(
        "event_type", "n",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("kurt_excess"),
    ).orderBy("event_type")


_AGG_SKEW_SQL = """
WITH g AS (
  SELECT event_type, COUNT(value) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                       AS DECIMAL(30,4))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                       * CAST(value AS DECIMAL(12,2)) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                            AS DECIMAL(30,4))
                       * CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                              AS DECIMAL(30,4)) AS DECIMAL(38,8))) AS DOUBLE) AS s4
  FROM events GROUP BY event_type)
SELECT event_type, n,
       round((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)*(s1/n)*(s1/n))
             / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skew_pop,
       round((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n
              - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 6)
         AS kurt_excess
FROM g ORDER BY event_type
"""


def agg_corr_covar(spark: SparkSession, sf: str) -> DataFrame:
    """corr / covar_pop / covar_samp (reference covar_pop/samp, corr
    window+agg kernels) from exact decimal cross-moment sums."""
    li = tbl(spark, sf, "lineitem")
    x, y = dec("l_quantity", 12), dec("l_extendedprice", 12)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(30,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(30,4)")).cast("double").alias("sx2"),
        F.sum((y * y).cast("decimal(30,4)")).cast("double").alias("sy2"),
    )
    n, sx, sy, sxy, sx2, sy2 = (F.col(c) for c in
                                ("n", "sx", "sy", "sxy", "sx2", "sy2"))
    cov_pop = sxy / n - (sx / n) * (sy / n)
    var_x = sx2 / n - (sx / n) * (sx / n)
    var_y = sy2 / n - (sy / n) * (sy / n)
    return g.select(
        "l_returnflag", "n",
        F.round(cov_pop, 6).alias("covar_pop"),
        F.round(cov_pop * n / (n - 1), 6).alias("covar_samp"),
        F.round(cov_pop / F.sqrt(var_x * var_y), 6).alias("corr"),
    ).orderBy("l_returnflag")


_AGG_CORR_SQL = """
WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4)))
              AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,4)))
              AS DOUBLE) AS sx2,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4)))
              AS DOUBLE) AS sy2
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round(sxy/n - (sx/n)*(sy/n), 6) AS covar_pop,
       round((sxy/n - (sx/n)*(sy/n)) * n / (n - 1), 6) AS covar_samp,
       round((sxy/n - (sx/n)*(sy/n))
             / sqrt((sx2/n - (sx/n)*(sx/n)) * (sy2/n - (sy/n)*(sy/n))), 6) AS corr
FROM g ORDER BY l_returnflag
"""


def agg_object_agg(spark: SparkSession, sf: str) -> DataFrame:
    """object_agg (reference object_agg ftype = map_from_entries of
    collected pairs); emitted as a sorted k:v string so the value is
    order-insensitive and hashable."""
    o = tbl(spark, sf, "orders").where(F.col("o_orderkey") < 200)
    pairs = F.concat(F.col("o_orderkey").cast("string"), F.lit(":"),
                     F.col("o_orderstatus"))
    return (o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list(pairs)), ",").alias("omap"),
        F.count(F.lit(1)).alias("n"))
        .orderBy("o_custkey"))


_AGG_OBJAGG_SQL = """
SELECT o_custkey,
       string_agg(concat(CAST(o_orderkey AS VARCHAR), ':', o_orderstatus),
                  ',' ORDER BY concat(CAST(o_orderkey AS VARCHAR), ':', o_orderstatus)) AS omap,
       COUNT(*) AS n
FROM orders WHERE o_orderkey < 200
GROUP BY o_custkey ORDER BY o_custkey
"""


def agg_sample(spark: SparkSession, sf: str) -> DataFrame:
    """TABLESAMPLE / df.sample (reference physical/sample.h:22).
    Sampling RNGs differ across engines, so the sample itself can't be
    value-compared -- instead the query emits ENGINE-CHECKED INVARIANTS
    the oracle states as constants: the sampled row count lies within
    +-6 sigma of the binomial expectation, every sampled key exists in
    the source (anti-join empty), and the sampled key range sits inside
    the source range. n_source is exact and hash-compared for real."""
    li = tbl(spark, sf, "lineitem")
    frac = 0.1
    s = li.sample(fraction=frac, seed=42)
    stats = s.agg(F.count(F.lit(1)).alias("_n_sampled"),
                  F.min("l_orderkey").alias("_smin"),
                  F.max("l_orderkey").alias("_smax"))
    src = li.agg(F.count(F.lit(1)).alias("n_source"),
                 F.min("l_orderkey").alias("_min"),
                 F.max("l_orderkey").alias("_max"))
    # distinct keys seen in the sample but absent from the source: a
    # correct sample is a subset, so this count must be 0
    stray = (s.select("l_orderkey").distinct()
             .join(li.select("l_orderkey").distinct(), "l_orderkey",
                   "left_anti")
             .agg(F.count(F.lit(1)).alias("_n_stray")))
    mu = F.col("n_source") * frac
    sigma = F.sqrt(F.col("n_source") * frac * (1 - frac))
    return (stats.crossJoin(src).crossJoin(stray).select(
        "n_source",
        ((F.col("_n_sampled") >= mu - 6 * sigma)
         & (F.col("_n_sampled") <= mu + 6 * sigma)).alias("n_in_bounds"),
        (F.col("_n_stray") == 0).alias("keys_in_source"),
        ((F.col("_smin") >= F.col("_min"))
         & (F.col("_smax") <= F.col("_max"))).alias("range_ok")))


_AGG_SAMPLE_SQL = """
SELECT COUNT(*) AS n_source,
       TRUE AS n_in_bounds,
       TRUE AS keys_in_source,
       TRUE AS range_ok
FROM lineitem
"""


def agg_approx_ndv(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (reference theta sketches,
    bodo/libs/_theta_sketches.cpp). Sketch estimates differ across
    engines, so the estimate itself is wrapped in an engine-checked
    invariant -- |approx - exact| / exact <= 0.05 (HLL++ at rsd=0.02,
    so 5% is a 2.5-sigma envelope; deterministic for fixed data) --
    while the exact NDV is hash-compared for real."""
    li = tbl(spark, sf, "lineitem")
    return (li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
        F.countDistinct("l_partkey").alias("exact_parts"))
        .select(
            "exact_parts",
            (F.abs(F.col("_approx") - F.col("exact_parts"))
             / F.col("exact_parts") <= 0.05).alias("rel_err_ok")))


_AGG_APPROX_NDV_SQL = """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS rel_err_ok
FROM lineitem
"""


def agg_mode_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """MODE with a pinned tie rule (highest count, then lowest value):
    F.mode's tie choice is engine-specific, so the deterministic form is
    count + window-limit -- the same plan Snowflake's MODE compiles to
    when determinism matters. Most frequent order-priority per status."""
    from pyspark.sql import Window as W
    o = tbl(spark, sf, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority"),
                    F.col("n").alias("mode_count"))
            .orderBy("o_orderstatus"))


_AGG_MODE_SQL = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
FROM c
QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY n DESC, o_orderpriority) = 1
ORDER BY o_orderstatus
"""


def agg_idxmin_idxmax(spark: SparkSession, sf: str) -> DataFrame:
    """groupby idxmin/idxmax (reference groupby ftypes idxmin/idxmax,
    _groupby_ftypes.h) via min_by/max_by, plus row-tagged ngroup.
    Ties broken deterministically by pre-restricting to a unique-value
    slice (min_by's tie choice is engine-specific)."""
    from ..frame import BodoDataFrame
    o = tbl(spark, sf, "orders").where(F.col("o_orderkey") < 3000)
    g = BodoDataFrame(o).groupby("o_orderstatus")
    lo = g.idxmin("o_totalprice", "o_orderkey")._df
    hi = g.idxmax("o_totalprice", "o_orderkey")._df
    ng = (g.ngroup()._df.groupBy("o_orderstatus")
          .agg(F.min("ngroup").alias("ngroup"),
               F.count(F.lit(1)).alias("n_rows")))
    return (lo.join(hi, "o_orderstatus").join(ng, "o_orderstatus")
            .orderBy("o_orderstatus"))


_AGG_IDX_SQL = """
SELECT o_orderstatus,
       arg_min(o_orderkey, o_totalprice) AS o_totalprice_idxmin,
       arg_max(o_orderkey, o_totalprice) AS o_totalprice_idxmax,
       CAST(dense_rank() OVER (ORDER BY o_orderstatus) - 1 AS INT) AS ngroup,
       COUNT(*) AS n_rows
FROM orders WHERE o_orderkey < 3000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES: dict[str, QueryDef] = {
    "agg_idxmin_idxmax": QueryDef(agg_idxmin_idxmax, _AGG_IDX_SQL),
    "agg_mode_deterministic": QueryDef(agg_mode_deterministic,
                                       _AGG_MODE_SQL),
    "agg_variance_stats": QueryDef(agg_variance_stats, _AGG_VAR_SQL),
    "agg_conditional": QueryDef(agg_conditional, _AGG_COND_SQL),
    "agg_distinct_counts": QueryDef(agg_distinct_counts, _AGG_DISTINCT_SQL),
    "agg_minmax_first": QueryDef(agg_minmax_first, _AGG_MINMAX_SQL),
    "agg_listagg_sorted": QueryDef(agg_listagg_sorted, _AGG_LISTAGG_SQL),
    "agg_percentiles": QueryDef(agg_percentiles, _AGG_PCT_SQL),
    "agg_rollup": QueryDef(agg_rollup, _AGG_ROLLUP_SQL),
    "agg_cube": QueryDef(agg_cube, _AGG_CUBE_SQL),
    "agg_grouping_sets": QueryDef(agg_grouping_sets, _AGG_GSETS_SQL),
    "agg_pivot": QueryDef(agg_pivot, _AGG_PIVOT_SQL),
    "agg_unpivot": QueryDef(agg_unpivot, _AGG_UNPIVOT_SQL),
    "agg_width_bucket_histogram": QueryDef(agg_width_bucket_histogram, _AGG_WB_SQL),
    "agg_skew_kurt_moments": QueryDef(agg_skew_kurt_moments, _AGG_SKEW_SQL),
    "agg_corr_covar": QueryDef(agg_corr_covar, _AGG_CORR_SQL),
    "agg_object_agg": QueryDef(agg_object_agg, _AGG_OBJAGG_SQL),
    "agg_sample": QueryDef(agg_sample, _AGG_SAMPLE_SQL),
    "agg_approx_ndv": QueryDef(agg_approx_ndv, _AGG_APPROX_NDV_SQL),
}
