"""Plan-shape assertions: the scale-posture contract. These fail if a
code change silently loses predicate pushdown, column pruning, broadcast
joins, whole-stage codegen, or the window-group-limit rewrite -- the
properties that make the same plan viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bodo_spark.queries._util import tbl
from bodo_spark.queries.tpch import q1_pricing_summary, q5_local_supplier_volume
from bodo_spark.queries.windows import win_qualify_latest_order

from .conftest import SF_DIR


def plan_str(df, mode="formatted") -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    df = (tbl(spark, SF_DIR, "lineitem")
          .where(F.col("l_shipdate") > "1997-01-01")
          .select("l_orderkey", "l_quantity"))
    p = plan_str(df)
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:200], p
    # pruned read schema: only the 3 referenced columns reach the scan
    read_schema = p.split("ReadSchema")[1][:250]
    assert "l_extendedprice" not in read_schema, read_schema


def test_broadcast_join_chosen(spark):
    p = plan_str(q5_local_supplier_volume(spark, SF_DIR))
    assert "BroadcastHashJoin" in p, p


def test_whole_stage_codegen(spark):
    # AQE wraps the plan until execution; disable it just for the check
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan_str(q1_pricing_summary(spark, SF_DIR), "codegen")
        n = int(p.split("Found ")[1].split(" WholeStageCodegen")[0])
        assert n >= 1, p[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_partial_final_aggregation(spark):
    p = plan_str(q1_pricing_summary(spark, SF_DIR))
    # map-side partial agg before the exchange, final after
    assert p.count("HashAggregate") >= 2, p
    assert "Exchange" in p, p


def test_window_group_limit_rewrite(spark):
    """QUALIFY rn=1 must plan as WindowGroupLimit (Spark 3.5+
    InferWindowGroupLimit), not a full sort of every partition."""
    p = plan_str(win_qualify_latest_order(spark, SF_DIR))
    assert "WindowGroupLimit" in p, p


def test_semi_join_stays_semi(spark):
    c = tbl(spark, SF_DIR, "customer")
    o = tbl(spark, SF_DIR, "orders")
    p = plan_str(c.join(o, c.c_custkey == o.o_custkey, "left_semi"))
    assert "LeftSemi" in p, p


def test_limit_becomes_take_ordered(spark):
    df = (tbl(spark, SF_DIR, "orders")
          .orderBy(F.col("o_totalprice").desc()).limit(10))
    p = plan_str(df)
    assert "TakeOrderedAndProject" in p, p
