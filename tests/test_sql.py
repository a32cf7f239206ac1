"""Tests for the Snowflake-ish SQL context: QUALIFY desugar (DuckDB runs
QUALIFY natively as oracle), dialect function shims."""

from __future__ import annotations

import pandas as pd

from bodo_spark.sql import BodoSQLContext, desugar_qualify

from .conftest import SF_DIR


def _ctx(spark):
    return BodoSQLContext(
        {"orders": f"{SF_DIR}/orders.parquet",
         "customer": f"{SF_DIR}/customer.parquet"}, spark=spark)


def test_qualify_rn1(spark, duck):
    bc = _ctx(spark)
    q = """
    SELECT o_custkey, o_orderkey
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    """
    got = bc.sql(q).to_pandas().sort_values("o_custkey").reset_index(drop=True)
    exp = duck.execute(q).df().sort_values("o_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_qualify_with_tail(spark, duck):
    bc = _ctx(spark)
    q = """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY rank() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5
    """
    got = bc.sql(q).to_pandas().reset_index(drop=True)
    exp = duck.execute(q).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_desugar_no_qualify_passthrough():
    q = "SELECT 1 AS x"
    assert desugar_qualify(q) == q


def test_snowflake_shims(spark):
    bc = _ctx(spark)
    row = bc.sql("""
        SELECT IFF(1 > 0, 10.0, 20.0) AS iff_v,
               DIV0(5.0, 0.0) AS div0_v,
               DIV0(10.0, 4.0) AS div_v,
               SQUARE(3.0) AS sq,
               EDITDISTANCE('kitten', 'sitting') AS ed,
               STRTOK('a,b,c', ',', 2) AS tok,
               DATE_FROM_PARTS(2024, 2, 29) AS dfp,
               TRY_TO_DOUBLE('x') AS bad_num
    """).to_pandas().iloc[0]
    assert row["iff_v"] == 10.0
    assert row["div0_v"] == 0.0
    assert row["div_v"] == 2.5
    assert row["sq"] == 9.0
    assert row["ed"] == 3
    assert row["tok"] == "b"
    assert str(row["dfp"])[:10] == "2024-02-29"
    assert pd.isna(row["bad_num"])


def test_sql_join_agg_vs_duck(spark, duck):
    bc = _ctx(spark)
    q = """
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """
    got = bc.sql(q).to_pandas().reset_index(drop=True)
    exp = duck.execute(q).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pandas_table_registration(spark):
    bc = BodoSQLContext({"t": pd.DataFrame({"a": [1, 2, 3]})}, spark=spark)
    assert bc.sql("SELECT SUM(a) AS s FROM t").to_pandas()["s"][0] == 6


def test_context_reference_api_names(spark):
    """add_or_replace_view/remove_view/convert_to_pandas/generate_plan/
    validate_query/execute_ddl (reference context.py public surface)."""
    import pandas as pd
    import pytest
    from bodo_spark.sql import BodoSQLContext
    bc = BodoSQLContext(spark=spark)
    bc.add_or_replace_view("v1", pd.DataFrame({"a": [1, 2, 3]}))
    assert bc.convert_to_pandas("SELECT SUM(a) AS s FROM v1")["s"][0] == 6
    plan = bc.generate_plan("SELECT a FROM v1 WHERE a > 1")
    assert "Physical Plan" in plan
    assert bc.validate_query("SELECT a FROM v1")
    with pytest.raises(Exception):
        bc.validate_query("SELECT nope FROM v1")
    bc.execute_ddl("CREATE TABLE t_ddl_check (x INT) USING parquet")
    try:
        assert bc.validate_query("SELECT x FROM t_ddl_check")
    finally:
        bc.execute_ddl("DROP TABLE t_ddl_check")
    bc.remove_view("v1")


def test_generator_rewrite_and_named_params(spark):
    """TABLE(GENERATOR(ROWCOUNT => n)) -> range(n) (reference BodoSQL
    test_lateral.py) and @name named-parameter binding via Spark's
    parameterized SQL (reference context.py named_params_dict)."""
    import pandas as pd

    from bodo_spark.sql import BodoSQLContext

    bc = BodoSQLContext({"t1": pd.DataFrame({"i": [1, 2]})}, spark=spark)
    r = bc.sql(
        "SELECT COUNT(*) AS c FROM TABLE(GENERATOR(ROWCOUNT => 1776))"
    ).spark.collect()
    assert r[0]["c"] == 1776
    r = bc.sql("SELECT i, COUNT(*) AS c FROM t1, "
               "LATERAL TABLE(GENERATOR(ROWCOUNT => 10)) GROUP BY i "
               "ORDER BY i").spark.collect()
    assert [(x["i"], x["c"]) for x in r] == [(1, 10), (2, 10)]
    r = bc.sql("SELECT COUNT(*) AS c FROM t1 WHERE i >= @lo AND i < @hi",
               params={"lo": 2, "hi": 99}).spark.collect()
    assert r[0]["c"] == 1
    # injection-shaped string stays a literal value
    r = bc.sql("SELECT COUNT(*) AS c FROM t1 WHERE CAST(i AS STRING) = @s",
               params={"s": "1 OR 1=1"}).spark.collect()
    assert r[0]["c"] == 0


def test_validate_query_compiles(spark):
    """validate_query_compiles (reference context.py:198): full
    physical planning without execution, named params bound; invalid
    SQL raises."""
    import pandas as pd
    import pytest as _pytest

    from bodo_spark.sql import BodoSQLContext

    bc = BodoSQLContext(
        {"t_vqc": pd.DataFrame({"a": [1, 2, 3]})}, spark=spark)
    assert bc.validate_query_compiles("SELECT a + 1 FROM t_vqc")
    assert bc.validate_query_compiles(
        "SELECT a FROM t_vqc WHERE a > @lo", params_dict={"lo": 1})
    with _pytest.raises(Exception):
        bc.validate_query_compiles("SELECT nosuchcol FROM t_vqc")
