"""Shared helpers for the query battery.

Numeric-determinism policy (so the driver's value-hash matches the DuckDB
oracle bit-for-bit):
  - All money/ratio columns in the test data are 2-decimal values stored as
    doubles. We cast to DECIMAL(18,2) *before* aggregating: decimal
    arithmetic is exact in both engines, so SUM/aggregations agree exactly;
    the final CAST(... AS DOUBLE) then yields identical doubles.
  - Averages are written explicitly as CAST(sum_dec AS DOUBLE)/count so both
    engines do the same single double division (their built-in AVG/decimal
    division rules differ).
  - Outputs never contain raw timestamps (tz-awareness differs across
    engines' pandas conversion); we format to 'yyyy-MM-dd[ HH:mm:ss]'
    strings or extract integer parts.
  - Genuinely float-fuzzy results (trig, cosine similarity) are aggregated
    and/or rounded so a low-bit difference cannot flip the hash.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Mode switch lives in bodo_spark.modes (operators need it too); decimal
# rationale: Spark's decimal multiply goes through java.math.BigDecimal
# (~1 us/row, measured 2.5-4x on aggregation-heavy TPC-H) even at
# precision <= 18, so benchmarks run fast mode (plain doubles) while the
# correctness gate runs exact mode (DECIMAL, bit-identical to DuckDB).
from ..modes import exact_mode  # noqa: F401  (re-export)


@dataclass(frozen=True)
class QueryDef:
    """A registered query: the Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, same output column names
    doc: str = ""


# Session-level schema memo for the immutable test tables: every
# `spark.read.parquet` constructs a fresh reader and SCHEDULES a
# schema-inference job (~50-300 ms of job + planning gap per call --
# guide §7.3 driver fixed costs; q5 alone constructs six readers, the
# bench ~80). The first read of each table infers through Spark exactly
# as before and the StructType is memoized by absolute path; later
# reads pass it explicitly and skip the job. Metadata only -- the same
# schema Spark would re-infer (test tables are immutable within a run);
# every query still scans its parquet from disk.
_SCHEMA_CACHE: dict = {}


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a test table; normalizes nanosecond parquet timestamps.

    The events table stores TIMESTAMP(NANOS), which Spark 4 cannot read
    natively; with spark.sql.legacy.parquet.nanosAsLong the column scans
    as epoch-nanos LongType and is converted here to a microsecond
    timestamp (values in the test data are us-aligned, so lossless --
    DuckDB likewise reads this file at us precision).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = os.path.abspath(path)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    from pyspark.sql import types as T
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")))
    return df




def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact-arithmetic cast; see module docstring.

    Precision discipline (exact mode): pick the SMALLEST precision that
    holds the column (money<=10^6: 8; rates<=9.99: 3; quantity<=99: 4) so
    decimal products stay at precision <= 18 and sums keep compact-long
    (<=18-digit) aggregation buffers. DECIMAL values are exact at any
    declared precision, so the oracle match is unaffected by these choices.
    In fast mode this is a no-op double cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not exact_mode():
        return c.cast("double")
    return c.cast(f"decimal({prec},{scale})")


def one() -> Column:
    """Literal 1 for (1 +- rate) expressions. In exact mode: DECIMAL(1,0)
    -- a bare python `1` becomes IntegerType, which Spark widens to
    DECIMAL(10,0) in mixed arithmetic, inflating (1 - rate) to
    DECIMAL(13,2) and downstream products past 18 digits."""
    if not exact_mode():
        return F.lit(1.0)
    return F.lit(1).cast("decimal(1,0)")


def dsum(expr: Column) -> Column:
    """Exact decimal sum, emitted as double (bitwise-stable across engines)."""
    return F.sum(expr).cast("double")


def davg(expr: Column, count_col: Column) -> Column:
    """sum(dec)/count as a single double division."""
    return F.sum(expr).cast("double") / count_col


def fmt_date(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def bint(col: Column) -> Column:
    """Cast int-typed function results to bigint: DuckDB returns int64
    where Spark returns int32 (length, rank, extract, ...); aligning
    widths keeps a dtype-sensitive comparer happy."""
    return col.cast("bigint")
