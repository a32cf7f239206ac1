"""bodo_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system (bodo-ai/Bodo),
re-expressed Spark-first.

Public surface:
  - session.get_spark()           tuned SparkSession factory
  - sources.*                     read_parquet/csv/json/sql/iceberg, from_pandas, sinks
  - frame                         pandas-flavored lazy DataFrame veneer
  - sql                           Snowflake-ish SQL context (QUALIFY, fn shims)
  - operators.*                   asof join, dedup, similarity, text analysis
  - queries                       registered correctness/bench query battery
"""

from .frame import (  # noqa: F401
    BodoDataFrame,
    BodoSeries,
    DateOffset,
    concat,
    crosstab,
    cut,
    date_range,
    from_pandas,
    get_dummies,
    merge,
    merge_asof,
    qcut,
    read_csv,
    read_iceberg,
    read_iceberg_table,
    read_parquet,
    to_datetime,
    to_numeric,
    to_timedelta,
    timedelta_range,
    unique,
)
from .plans import summarize as plan_summary  # noqa: F401
from .session import get_spark  # noqa: F401
from .sql import BodoSQLContext  # noqa: F401

__version__ = "0.1.0"


def jit(fn=None, **jit_kwargs):
    """The reference's third entry point, ``@bodo.jit``
    (reference bodo/compiler.py:117: Numba typing + distributed-pass
    compilation of pandas code). On Spark there is nothing to compile:
    BodoDataFrame methods already BUILD a lazy Catalyst plan, so the
    decorator is the identity -- the decorated function runs once on
    the driver and its frame operations plan/execute distributed.

    Accepts and ignores the reference's knobs (cache, distributed,
    replicated, spawn, returns_maybe_distributed, args_maybe_distributed)
    so existing ``@bodo.jit(cache=True)`` call sites work unchanged.
    """
    del jit_kwargs

    def _wrap(f):
        return f

    return _wrap if fn is None else fn
