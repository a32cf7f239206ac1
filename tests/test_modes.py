"""Numeric-mode contract: exact (decimal, oracle-bit-identical) vs fast
(double, bench path) must agree to float tolerance, and fast mode must not
leave decimal types in the output schema.
"""

from __future__ import annotations

import os

import pytest

from .conftest import SF_DIR


@pytest.fixture
def fast_mode():
    os.environ["BODO_SPARK_EXACT"] = "0"
    yield
    os.environ.pop("BODO_SPARK_EXACT", None)


def _run(spark, qname):
    from bodo_spark.queries import all_queries
    return all_queries()[qname].fn(spark, SF_DIR).toPandas()


@pytest.mark.parametrize("qname", ["q1_pricing_summary", "q6_forecast_revenue"])
def test_fast_mode_matches_exact_to_tolerance(spark, qname):
    exact = _run(spark, qname)
    os.environ["BODO_SPARK_EXACT"] = "0"
    try:
        fast = _run(spark, qname)
    finally:
        os.environ.pop("BODO_SPARK_EXACT", None)
    assert list(exact.columns) == list(fast.columns)
    assert len(exact) == len(fast)
    for c in exact.columns:
        if exact[c].dtype.kind == "f":
            import numpy as np
            assert np.allclose(exact[c], fast[c], rtol=1e-9), c
        else:
            assert (exact[c] == fast[c]).all(), c


def test_minhash_fast_mode_finds_same_pairs(spark):
    """Fast mode swaps md5->xxhash64 in MinHash/LSH. Candidate recall can
    differ between hash families in principle, but verification is exact
    Jaccard, so on the testdata (true dups are high-jaccard) both modes
    must return the identical pair set."""
    exact = {tuple(r) for r in _run_rows(spark, "dedup_minhash_lsh")}
    os.environ["BODO_SPARK_EXACT"] = "0"
    try:
        fast = {tuple(r) for r in _run_rows(spark, "dedup_minhash_lsh")}
    finally:
        os.environ.pop("BODO_SPARK_EXACT", None)
    assert exact == fast


def _run_rows(spark, qname):
    from bodo_spark.queries import all_queries
    return all_queries()[qname].fn(spark, SF_DIR).collect()


def test_fast_mode_has_no_decimal_columns(spark, fast_mode):
    from bodo_spark.queries.tpch import q1_pricing_summary
    df = q1_pricing_summary(spark, SF_DIR)
    assert "decimal" not in str(df.schema).lower(), df.schema
