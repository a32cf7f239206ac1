"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``bodo_spark`` package; this module adapts its
query registry to the driver's expected shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from functools import wraps

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path from another cwd;
# make the sibling bodo_spark package importable regardless
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from bodo_spark.queries import all_queries
from bodo_spark.session import _apply_runtime_confs


def _exact(fn):
    """Build the plan in exact (decimal+md5, oracle-bit-identical) mode.

    The library defaults to fast/double mode (bodo_spark.modes); the
    correctness gate is the one consumer that needs bit-reproducible
    arithmetic, so it opts in here. The env flag is read at plan-build
    time only, so it is restored immediately after the DataFrame (a lazy
    plan) is constructed.

    Also applies the engine's documented runtime confs (ansi=false, UTC,
    AQE/bloom posture -- bodo_spark/session.py) to the CALLER's session:
    driver-run queries must execute under the engine's semantics, not the
    driver session's Spark defaults (Spark 4 ships ansi=true, which e.g.
    turns wraparound arithmetic into ARITHMETIC_OVERFLOW errors)."""
    @wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _apply_runtime_confs(spark)
        prev = os.environ.get("BODO_SPARK_EXACT")
        os.environ["BODO_SPARK_EXACT"] = "1"
        try:
            return fn(spark, sf_dir)
        finally:
            if prev is None:
                os.environ.pop("BODO_SPARK_EXACT", None)
            else:
                os.environ["BODO_SPARK_EXACT"] = prev
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    _apply_runtime_confs(spark)
    from bodo_spark.queries.tpch import q1_pricing_summary
    return _exact(q1_pricing_summary)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md section 2."""
    return {name: _exact(qd.fn) for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (same output column names)."""
    return {name: qd.oracle for name, qd in all_queries().items()
            if qd.oracle is not None}
