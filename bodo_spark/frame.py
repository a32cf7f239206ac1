"""Pandas-flavored lazy DataFrame veneer over pyspark.sql.DataFrame.

Reference parity: the Bodo DataFrames front-end (reference
bodo/pandas/frame.py, series.py, groupby.py) -- a lazy, pandas-like API
whose every method appends to a logical plan. Here the "LazyPlan" IS the
pyspark DataFrame (Catalyst plan); methods translate pandas semantics to
DataFrame operations 1:1, so the optimizer sees the whole declarative
plan (pushdown/pruning/broadcast all apply).

Deliberate deltas from pandas, documented per SURVEY.md section 7 "hard
parts":
  - No implicit row order: head(n) is "some n rows" unless the frame was
    sorted (sort_values) first; a positional index is materialized only
    on to_pandas(). (Reference carries index columns through plans --
    bodo/pandas/plan.py:1475; we materialize lazily instead.)
  - len(df)/shape trigger one count and cache it (reference lazy
    metadata, bodo/pandas/lazy_metadata.py).
  - NaN vs NULL: Spark nulls map to NaN/None on collection, like the
    reference's nullable arrays.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["BodoDataFrame", "BodoSeries", "DateOffset", "read_parquet", "read_csv",
           "read_iceberg", "read_iceberg_table", "from_pandas", "concat", "merge", "merge_asof",
           "to_datetime", "cut", "qcut", "crosstab", "get_dummies",
           "to_numeric", "unique", "date_range", "to_timedelta",
           "timedelta_range"]


# --------------------------------------------------------------------------
# Series: a named Column expression bound to a parent frame
# --------------------------------------------------------------------------
class DateOffset:
    """pd.DateOffset (reference docs api_docs/pandas/dateoffsets/):
    calendar-aware timestamp arithmetic. Month/year parts go through
    add_months (calendar semantics: Jan 31 + 1 month = Feb 28/29);
    day/time parts are a fixed day-time interval."""

    def __init__(self, years: int = 0, months: int = 0, weeks: int = 0,
                 days: int = 0, hours: int = 0, minutes: int = 0,
                 seconds: int = 0, n: int = 1):
        self.months = n * (years * 12 + months)
        self.days = n * (weeks * 7 + days)
        self.secs = n * (hours * 3600 + minutes * 60 + seconds)

    def _apply(self, col: Column, sign: int = 1) -> Column:
        out = col
        if self.months:
            # year-month INTERVAL addition clamps the day-of-month AND
            # keeps the time of day (add_months would return a DATE)
            out = out + F.make_ym_interval(F.lit(0),
                                           F.lit(sign * self.months))
        if self.days or self.secs:
            out = out + F.make_dt_interval(
                F.lit(sign * self.days), F.lit(0), F.lit(0),
                F.lit(float(sign * self.secs)))
        return out


class BodoSeries:
    """Lazy column expression (reference bodo/pandas/series.py)."""

    def __init__(self, frame: "BodoDataFrame", col: Column, name: str):
        self._frame = frame
        self._col = col
        self.name = name

    # -- arithmetic / comparison / boolean ops → new Series
    def _bin(self, other, op) -> "BodoSeries":
        o = other._col if isinstance(other, BodoSeries) else F.lit(other)
        return BodoSeries(self._frame, op(self._col, o), self.name)

    def __add__(self, o):
        if isinstance(o, DateOffset):
            return BodoSeries(self._frame, o._apply(self._col), self.name)
        return self._bin(o, lambda a, b: a + b)

    def __radd__(self, o):
        if isinstance(o, DateOffset):
            return self + o
        return self._bin(o, lambda a, b: b + a)

    def __sub__(self, o):
        if isinstance(o, DateOffset):
            return BodoSeries(self._frame, o._apply(self._col, -1),
                              self.name)
        return self._bin(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._bin(o, lambda a, b: b - a)
    def __mul__(self, o): return self._bin(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._bin(o, lambda a, b: b * a)
    def __truediv__(self, o): return self._bin(o, lambda a, b: a / b)
    def __mod__(self, o): return self._bin(o, lambda a, b: a % b)
    def __neg__(self): return BodoSeries(self._frame, -self._col, self.name)
    def __eq__(self, o): return self._bin(o, lambda a, b: a == b)  # type: ignore[override]
    def __ne__(self, o): return self._bin(o, lambda a, b: a != b)  # type: ignore[override]
    def __lt__(self, o): return self._bin(o, lambda a, b: a < b)
    def __le__(self, o): return self._bin(o, lambda a, b: a <= b)
    def __gt__(self, o): return self._bin(o, lambda a, b: a > b)
    def __ge__(self, o): return self._bin(o, lambda a, b: a >= b)
    def __and__(self, o): return self._bin(o, lambda a, b: a & b)
    def __or__(self, o): return self._bin(o, lambda a, b: a | b)
    def __xor__(self, o):
        return self._bin(o, lambda a, b: a.cast("boolean") != b.cast("boolean"))
    def __floordiv__(self, o):
        return self._bin(o, lambda a, b: F.floor(a / b))
    def __rfloordiv__(self, o):
        return self._bin(o, lambda a, b: F.floor(b / a))
    def __pow__(self, o): return self._bin(o, lambda a, b: F.pow(a, b))
    def __rpow__(self, o): return self._bin(o, lambda a, b: F.pow(b, a))
    def __invert__(self): return BodoSeries(self._frame, ~self._col, self.name)

    def clip(self, lower=None, upper=None) -> "BodoSeries":
        c = self._col
        if lower is not None:
            c = F.greatest(c, F.lit(lower))
        if upper is not None:
            c = F.least(c, F.lit(upper))
        return BodoSeries(self._frame, c, self.name)

    # -- pandas Series API subset
    def isin(self, values) -> "BodoSeries":
        """reference series.py:1236; Series-valued isin becomes a
        left-semi join at the frame level (frame.isin_frame)."""
        return BodoSeries(self._frame, self._col.isin(list(values)), self.name)

    def isna(self): return BodoSeries(self._frame, self._col.isNull(), self.name)
    def notna(self): return BodoSeries(self._frame, self._col.isNotNull(), self.name)

    def fillna(self, value) -> "BodoSeries":
        return BodoSeries(self._frame,
                          F.coalesce(self._col, F.lit(value)), self.name)

    def astype(self, dtype) -> "BodoSeries":
        spark_t = _dtype_to_spark(dtype)
        return BodoSeries(self._frame, self._col.cast(spark_t), self.name)

    def between(self, lo, hi) -> "BodoSeries":
        return BodoSeries(self._frame, self._col.between(lo, hi), self.name)

    def where(self, cond: "BodoSeries", other=None) -> "BodoSeries":
        """reference series.py:1422 (CaseExpression)."""
        o = other._col if isinstance(other, BodoSeries) else F.lit(other)
        return BodoSeries(self._frame,
                          F.when(cond._col, self._col).otherwise(o), self.name)

    def abs(self): return BodoSeries(self._frame, F.abs(self._col), self.name)
    def round(self, n=0): return BodoSeries(self._frame, F.round(self._col, n), self.name)

    def map(self, func: Callable, return_type: str = "string") -> "BodoSeries":
        """Arrow-batched pandas UDF (reference Series.map,
        series.py:737 -> PythonScalarFuncExpression). The slow path;
        prefer builtin exprs."""
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(return_type)
        def _u(s: pd.Series) -> pd.Series:
            return s.map(func)
        return BodoSeries(self._frame, _u(self._col), self.name)

    # aggregations (trigger execution)
    def _agg(self, fn) -> Any:
        row = self._frame._df.select(fn(self._col).alias("v")).collect()[0]
        return row["v"]

    def sum(self): return self._agg(F.sum)
    def mean(self): return self._agg(F.avg)
    def min(self): return self._agg(F.min)
    def max(self): return self._agg(F.max)
    def count(self): return self._agg(F.count)
    def nunique(self): return self._agg(F.countDistinct)
    def std(self): return self._agg(F.stddev_samp)
    def var(self): return self._agg(F.var_samp)

    def quantile(self, q=0.5):
        """reference series.py:1355 (t-digest approx / exact); exact here."""
        return self._agg(lambda c: F.expr(f"percentile({self.name}, {q})"))

    def any(self): return bool(self._agg(F.bool_or))
    def all(self): return bool(self._agg(F.bool_and))

    def mode(self):
        """Most frequent value, deterministic ties (lowest value wins)."""
        row = (self._frame._df.groupBy(self._col.alias(self.name))
               .agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.col("n").desc(), F.col(self.name))
               .limit(1).collect())
        return row[0][self.name] if row else None

    def prod(self):
        """reference Series.prod (series.py)."""
        return self._agg(lambda c: F.product(c))

    def cumsum(self, order_by: str) -> "BodoSeries":
        """Running sum over an EXPLICIT ordering (reference Series.cumsum;
        distributed frames have no implicit row order, so the ordering key
        is required -- same contract as rolling/groupby.cumsum)."""
        w = (W.orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoSeries(self._frame, F.sum(self._col).over(w), self.name)

    def cumprod(self, order_by: str) -> "BodoSeries":
        """Running product (reference Series.cumprod), same explicit-
        ordering contract as cumsum; F.product is the JVM aggregate."""
        w = (W.orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoSeries(self._frame, F.product(self._col).over(w),
                          self.name)

    def diff(self, periods: int = 1, order_by: str | None = None,
             partition_by: str | None = None) -> "BodoSeries":
        """pandas Series.diff = x - x.shift(periods) (reference
        dataframe diff ftype); explicit ordering like shift."""
        return self - self.shift(periods, order_by, partition_by)

    def pct_change(self, periods: int = 1, order_by: str | None = None,
                   partition_by: str | None = None) -> "BodoSeries":
        """pandas pct_change: x / x.shift(periods) - 1."""
        prev = self.shift(periods, order_by, partition_by)
        return self / prev - 1

    def mask(self, cond: "BodoSeries", other=None) -> "BodoSeries":
        """pandas Series.mask: replace where cond is TRUE (inverse of
        where)."""
        return self.where(~cond, other)

    def cummax(self, order_by: str) -> "BodoSeries":
        w = (W.orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoSeries(self._frame, F.max(self._col).over(w), self.name)

    def cummin(self, order_by: str) -> "BodoSeries":
        w = (W.orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoSeries(self._frame, F.min(self._col).over(w), self.name)

    def ffill(self, order_by: str | None = None,
              partition_by: str | None = None) -> "BodoSeries":
        """pandas ffill: last non-null so far (reference Series.ffill);
        explicit ordering, optional partition for the scale path."""
        if order_by is None:
            raise ValueError("ffill() needs order_by=<col>")
        w = ((W.partitionBy(partition_by) if partition_by else W)
             .orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoSeries(self._frame,
                          F.last(self._col, ignorenulls=True).over(w),
                          self.name)

    def bfill(self, order_by: str | None = None,
              partition_by: str | None = None) -> "BodoSeries":
        if order_by is None:
            raise ValueError("bfill() needs order_by=<col>")
        w = ((W.partitionBy(partition_by) if partition_by else W)
             .orderBy(order_by)
             .rowsBetween(W.currentRow, W.unboundedFollowing))
        return BodoSeries(self._frame,
                          F.first(self._col, ignorenulls=True).over(w),
                          self.name)

    def pad(self, **kw): return self.ffill(**kw)
    def backfill(self, **kw): return self.bfill(**kw)

    def _moments(self) -> tuple:
        """Two-pass CENTERED moments for the pandas-estimator reductions.
        Raw power sums (sum x, x^2, x^3, x^4) cancel catastrophically
        when |mean| >> std (ids, prices ~1e8, epoch timestamps), so pass
        1 gets the mean and pass 2 accumulates (x - mean)^k -- the same
        exactness contract pandas' two-pass moments give."""
        c = self._col.cast("double")
        first = self._frame._df.select(
            F.count(c).alias("n"), F.avg(c).alias("m")).collect()[0]
        n, m = first["n"], first["m"]
        if not n:
            return (0, 0.0, 0.0, 0.0, 0.0)
        d = c - F.lit(float(m))
        row = self._frame._df.select(
            F.sum(d * d).alias("c2"), F.sum(d * d * d).alias("c3"),
            F.sum(d * d * d * d).alias("c4")).collect()[0]
        return (n, float(m), row["c2"], row["c3"], row["c4"])

    def skew(self) -> float:
        """pandas sample skewness (bias-adjusted G1; Spark's builtin
        skewness() is the population g1, so adjust explicitly)."""
        n, _, c2, c3, _ = self._moments()
        if n < 3:
            return float("nan")
        m2 = c2 / n
        if m2 <= 0:  # constant series: pandas yields NaN
            return float("nan")
        m3 = c3 / n
        g1 = m3 / m2 ** 1.5
        return g1 * (n * (n - 1)) ** 0.5 / (n - 2)

    def kurt(self) -> float:
        """pandas sample excess kurtosis (bias-adjusted G2)."""
        n, _, c2, _, c4 = self._moments()
        if n < 4:
            return float("nan")
        m2 = c2 / n
        if m2 <= 0:  # constant series: pandas yields NaN
            return float("nan")
        m4 = c4 / n
        g2 = m4 / (m2 * m2) - 3.0
        return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))

    def kurtosis(self) -> float: return self.kurt()

    def sem(self) -> float:
        """Standard error of the mean: std / sqrt(n)."""
        row = self._frame._df.select(
            F.stddev_samp(self._col).alias("s"),
            F.count(self._col).alias("n")).collect()[0]
        return row["s"] / row["n"] ** 0.5

    def autocorr(self, lag: int = 1, order_by: str | None = None) -> float:
        """pandas Series.autocorr: corr(x, x.shift(lag)); explicit
        ordering like shift."""
        shifted = self.shift(lag, order_by=order_by)
        # window exprs can't sit inside an aggregate: project first
        row = (self._frame._df
               .select(self._col.alias("_a"), shifted._col.alias("_b"))
               .select(F.corr("_a", "_b").alias("r")).collect()[0])
        return row["r"]

    def unique(self) -> list:
        return unique(self)

    def describe(self) -> pd.Series:
        """pandas Series.describe: count/mean/std/min/quartiles/max in
        ONE aggregate job (exact percentiles)."""
        row = (self._frame._df.select(self._col.alias("_x"))
               .select(
                   F.count("_x").alias("count"),
                   F.avg("_x").alias("mean"),
                   F.stddev_samp("_x").alias("std"),
                   F.min("_x").alias("min"),
                   F.expr("percentile(_x, array(0.25D, 0.5D, 0.75D))")
                   .alias("q"),
                   F.max("_x").alias("max")).collect()[0])
        return pd.Series({"count": row["count"], "mean": row["mean"],
                          "std": row["std"], "min": row["min"],
                          "25%": row["q"][0], "50%": row["q"][1],
                          "75%": row["q"][2], "max": row["max"]})

    def idxmax(self, index_col: str):
        """Index (from ``index_col``) of the max value (reference
        Series.idxmax; the distributed index is an explicit column)."""
        row = (self._frame._df
               .select(F.max_by(F.col(index_col), self._col).alias("i"))
               .collect()[0])
        return row["i"]

    def idxmin(self, index_col: str):
        row = (self._frame._df
               .select(F.min_by(F.col(index_col), self._col).alias("i"))
               .collect()[0])
        return row["i"]

    def dropna(self) -> "BodoDataFrame":
        """Rows of the parent frame where this Series is non-null."""
        return BodoDataFrame(self._frame._df.where(self._col.isNotNull()))

    def rename(self, name: str) -> "BodoSeries":
        return BodoSeries(self._frame, self._col, name)

    def sample(self, frac: float, seed: int | None = None) -> "BodoDataFrame":
        return BodoDataFrame(
            self._frame._df.select(self._col.alias(self.name))
            .sample(fraction=frac, seed=seed))

    def rolling(self, window: int, order_by: str,
                partition_by: str | None = None,
                min_periods: int | None = None,
                allow_global: bool = True) -> "_SeriesRolling":
        """Series.rolling (reference hiframes/rolling.py): the frame's
        rolling scoped to this column. ``allow_global`` defaults True
        here (Series rolling is the small-frame idiom); pass
        ``partition_by`` at scale."""
        roll = self._frame.rolling(window, order_by=order_by,
                                   partition_by=partition_by,
                                   min_periods=min_periods,
                                   allow_global=allow_global)
        return _SeriesRolling(roll, self.name)

    def drop_duplicates(self) -> "BodoDataFrame":
        return BodoDataFrame(
            self._frame._df.select(self._col.alias(self.name)).distinct())

    def to_frame(self) -> "BodoDataFrame":
        return BodoDataFrame(self._frame._df.select(
            self._col.alias(self.name)))

    @property
    def hasnans(self) -> bool:
        return self._frame._df.where(self._col.isNull()).limit(1).count() > 0

    def equals(self, other: "BodoSeries") -> bool:
        """Value equality under the frame's rows (null == null)."""
        return self._frame._df.where(
            ~self._col.eqNullSafe(other._col)).limit(1).count() == 0

    # pandas named-operator spellings
    def add(self, o): return self + o
    def sub(self, o): return self - o
    def mul(self, o): return self * o
    def div(self, o): return self / o
    def truediv(self, o): return self / o
    def rdiv(self, o): return self._bin(o, lambda a, b: b / a)
    def floordiv(self, o): return self // o
    def mod(self, o): return self % o
    def pow(self, o): return self ** o
    def radd(self, o): return self + o
    def rsub(self, o): return self._bin(o, lambda a, b: b - a)
    def rmul(self, o): return self * o
    def rmod(self, o): return self._bin(o, lambda a, b: b % a)
    def rpow(self, o): return self._bin(o, lambda a, b: F.pow(b, a))
    def rfloordiv(self, o): return self._bin(o, lambda a, b: F.floor(b / a))
    def rtruediv(self, o): return self._bin(o, lambda a, b: b / a)
    def eq(self, o): return self == o
    def ne(self, o): return self != o
    def lt(self, o): return self < o
    def le(self, o): return self <= o
    def gt(self, o): return self > o
    def ge(self, o): return self >= o

    # pandas spelling aliases
    def isnull(self): return self.isna()
    def notnull(self): return self.notna()
    def product(self): return self.prod()

    def shift(self, periods: int = 1, order_by: str | None = None,
              partition_by: str | None = None) -> "BodoSeries":
        """Lag/lead over an EXPLICIT ordering (no implicit row order on
        a distributed frame). Without ``partition_by`` the window is a
        single task -- fine for small frames, pass a key at scale."""
        if order_by is None:
            raise ValueError("shift() needs order_by=<col>: distributed "
                             "frames have no implicit row order")
        w = (W.partitionBy(partition_by) if partition_by else W) \
            .orderBy(order_by)
        fn = F.lag(self._col, periods) if periods >= 0 \
            else F.lead(self._col, -periods)
        return BodoSeries(self._frame, fn.over(w), self.name)

    def rank(self, method: str = "average",
             order_by: str | None = None,
             partition_by: str | None = None) -> "BodoSeries":
        """pandas Series.rank over the value itself ('average', 'min',
        'dense', 'first'). 'first' additionally needs ``order_by`` as
        the tiebreaker; ``partition_by`` scopes the ranking per group
        (the scale path -- a global rank is a single-task sort)."""
        base = W.partitionBy(partition_by) if partition_by else W
        w = base.orderBy(self._col)
        if method == "min":
            r = F.rank().over(w)
        elif method == "dense":
            r = F.dense_rank().over(w)
        elif method == "first":
            if order_by is None:
                raise ValueError("rank(method='first') needs order_by")
            r = F.row_number().over(base.orderBy(self._col, order_by))
        elif method == "average":
            # average of the positions a tied value occupies:
            # rank + (count(==value) - 1) / 2
            cnt = F.count(F.lit(1)).over(
                W.partitionBy(*( [partition_by] if partition_by else []),
                              self._col))
            r = (F.rank().over(w) + (cnt - 1) / 2.0)
        else:
            raise ValueError(f"unsupported rank method {method!r}")
        return BodoSeries(self._frame, r.cast("double"), self.name)

    def convert_dtypes(self, **kwargs) -> "BodoSeries":
        """reference series.py:1522 convert_dtypes normalizes to Arrow
        dtypes; Spark columns already carry canonical Arrow-compatible
        types, so this is the documented identity."""
        del kwargs
        return self

    def isocalendar(self) -> "BodoDataFrame":
        """ISO (year, week, day) triple (reference Series.isocalendar,
        series.py _isocalendar_helper)."""
        c = self._col
        iso_dow = F.pmod(F.dayofweek(c) + F.lit(5), F.lit(7)) + F.lit(1)
        return BodoDataFrame(self._frame._df.select(
            F.year(F.date_add(F.to_date(c), 4 - iso_dow)).alias("year"),
            F.weekofyear(c).alias("week"),
            iso_dow.alias("day")))

    def nlargest(self, n: int = 5) -> pd.Series:
        return (self._frame._df.select(self._col.alias(self.name))
                .orderBy(F.col(self.name).desc()).limit(n)
                .toPandas()[self.name])

    def nsmallest(self, n: int = 5) -> pd.Series:
        return (self._frame._df.select(self._col.alias(self.name))
                .orderBy(F.col(self.name).asc()).limit(n)
                .toPandas()[self.name])

    def value_counts(self) -> "BodoDataFrame":
        out = (self._frame._df.groupBy(self._col.alias(self.name))
               .agg(F.count(F.lit(1)).alias("count"))
               .orderBy(F.col("count").desc(), F.col(self.name)))
        return BodoDataFrame(out)

    @property
    def str(self): return _StrAccessor(self)
    @property
    def dt(self): return _DtAccessor(self)
    @property
    def ai(self): return _AiAccessor(self)

    def to_pandas(self) -> pd.Series:
        return self._frame._df.select(self._col.alias(self.name)) \
            .toPandas()[self.name]


class _StrAccessor:
    """reference series.py str accessor table -> F.* builtins."""

    def __init__(self, s: BodoSeries):
        self._s = s

    def _wrap(self, col: Column) -> BodoSeries:
        return BodoSeries(self._s._frame, col, self._s.name)

    def upper(self): return self._wrap(F.upper(self._s._col))
    def lower(self): return self._wrap(F.lower(self._s._col))
    def len(self): return self._wrap(F.length(self._s._col))
    def strip(self): return self._wrap(F.trim(self._s._col))
    def lstrip(self): return self._wrap(F.ltrim(self._s._col))
    def rstrip(self): return self._wrap(F.rtrim(self._s._col))
    def title(self): return self._wrap(F.initcap(self._s._col))
    def contains(self, pat, regex=True):
        return self._wrap(self._s._col.rlike(pat) if regex
                          else self._s._col.contains(pat))
    def startswith(self, p): return self._wrap(self._s._col.startswith(p))
    def endswith(self, p): return self._wrap(self._s._col.endswith(p))
    def replace(self, pat, repl, regex=True):
        return self._wrap(F.regexp_replace(self._s._col, pat, repl) if regex
                          else F.replace(self._s._col, F.lit(pat), F.lit(repl)))
    def slice(self, start=0, stop=None):
        length = (stop - start) if stop is not None else 1 << 30
        return self._wrap(F.substring(self._s._col, start + 1, length))
    def split(self, pat=" "): return self._wrap(F.split(self._s._col, pat))
    def get(self, i): return self._wrap(F.element_at(self._s._col, i + 1))
    def pad(self, width, side="left", fillchar=" "):
        fn = F.lpad if side == "left" else F.rpad
        return self._wrap(fn(self._s._col, width, fillchar))
    def zfill(self, width): return self._wrap(F.lpad(self._s._col, width, "0"))
    def repeat(self, n): return self._wrap(F.repeat(self._s._col, n))
    def find(self, sub): return self._wrap(F.instr(self._s._col, sub) - 1)
    def extract(self, pat, group=1):
        return self._wrap(F.regexp_extract(self._s._col, pat, group))

    def extractall(self, pat, group=0):
        """All matches as an array (reference str.extractall; the
        row-per-match index shape needs explode() after)."""
        return self._wrap(F.regexp_extract_all(self._s._col, F.lit(pat),
                                               F.lit(group)))

    def join(self, sep: str):
        """str.join over an array column."""
        return self._wrap(F.array_join(self._s._col, sep))

    def index(self, sub):
        """str.index: like find but raising on absence is a driver-side
        contract pandas enforces eagerly; distributed form returns -1
        (find) -- documented delta."""
        return self.find(sub)

    def rindex(self, sub):
        return self.rfind(sub)

    def isdecimal(self):
        return self._wrap(self._s._col.rlike("^[0-9]+$"))

    def cat(self, other: "BodoSeries", sep: str = ""):
        """reference series.py _str_cat_helper."""
        return self._wrap(F.concat_ws(sep, self._s._col, other._col))

    def casefold(self): return self._wrap(F.lower(self._s._col))

    def partition(self, sep: str = " "):
        """(head, sep, tail) around the FIRST separator, as a 3-field
        struct (pandas returns 3 columns; unpack with getField)."""
        c = self._s._col
        i = F.instr(c, sep)
        return self._wrap(F.when(i > 0, F.struct(
            F.substring(c, 1, i - 1).alias("head"),
            F.lit(sep).alias("sep"),
            F.substring(c, i + len(sep), 1 << 30).alias("tail"),
        )).otherwise(F.struct(c.alias("head"), F.lit("").alias("sep"),
                              F.lit("").alias("tail"))))

    def capitalize(self):
        c = self._s._col
        return self._wrap(F.concat(F.upper(F.substring(c, 1, 1)),
                                   F.lower(F.substring(c, 2, 1 << 30))))

    def swapcase(self):
        """Per-char case flip via translate over the ASCII alphabet."""
        lo = "abcdefghijklmnopqrstuvwxyz"
        return self._wrap(F.translate(self._s._col,
                                      lo + lo.upper(), lo.upper() + lo))

    def isdigit(self): return self._wrap(self._s._col.rlike("^[0-9]+$"))
    def isalpha(self): return self._wrap(self._s._col.rlike("^[A-Za-z]+$"))
    def isalnum(self): return self._wrap(self._s._col.rlike("^[A-Za-z0-9]+$"))
    def isspace(self): return self._wrap(self._s._col.rlike("^\\s+$"))
    def islower(self):
        c = self._s._col
        return self._wrap((c == F.lower(c)) & c.rlike("[A-Za-z]"))
    def isupper(self):
        c = self._s._col
        return self._wrap((c == F.upper(c)) & c.rlike("[A-Za-z]"))

    def count(self, pat):
        return self._wrap(F.regexp_count(self._s._col, F.lit(pat))
                          .cast("long"))

    def match(self, pat):
        """pandas str.match: regex anchored at the START only."""
        return self._wrap(self._s._col.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat):
        return self._wrap(self._s._col.rlike(f"^(?:{pat})$"))

    def findall(self, pat):
        # group 0 = whole match, pandas' no-capture-group behavior
        return self._wrap(F.regexp_extract_all(self._s._col, F.lit(pat),
                                               F.lit(0)))

    def translate(self, table: dict[int, str | int | None]):
        """pandas str.translate with a {ord: replacement} map. Spark's
        translate() is strictly char->char and drops chars whose
        replacement is missing (pandas keeps unmapped chars), so the
        map is decomposed: 1-char targets batch through translate(),
        multi-char targets chain through replace(), None targets strip
        via one regexp."""
        src = dst = dele = ""
        multi: list[tuple[str, str]] = []
        for k, v in table.items():
            if v is None:
                dele += chr(k)
                continue
            v = v if isinstance(v, str) else chr(v)
            if len(v) == 1:
                src += chr(k)
                dst += v
            else:
                multi.append((chr(k), v))
        c = self._s._col
        if dele:
            c = F.regexp_replace(c, "[" + re.escape(dele) + "]", "")
        if src:
            c = F.translate(c, src, dst)
        for ch, v in multi:
            c = F.replace(c, F.lit(ch), F.lit(v))
        return self._wrap(c)

    def rfind(self, sub: str):
        """Highest 0-based index of ``sub`` (-1 if absent): position of
        the reversed needle in the reversed haystack, flipped back."""
        c = self._s._col
        rpos = F.instr(F.reverse(c), sub[::-1])
        return self._wrap(F.when(rpos > 0,
                                 F.length(c) - rpos - len(sub) + 1)
                          .otherwise(F.lit(-1)))

    def rpartition(self, sep: str = " "):
        """(head, sep, tail) around the LAST separator; no-separator
        rows put the whole string in TAIL (pandas mirror of partition)."""
        c = self._s._col
        rpos = F.instr(F.reverse(c), sep[::-1])
        i = F.length(c) - rpos - len(sep) + 2  # 1-based sep start
        return self._wrap(F.when(rpos > 0, F.struct(
            F.substring(c, 1, i - 1).alias("head"),
            F.lit(sep).alias("sep"),
            F.substring(c, i + len(sep), 1 << 30).alias("tail"),
        )).otherwise(F.struct(F.lit("").alias("head"),
                              F.lit("").alias("sep"), c.alias("tail"))))

    def isnumeric(self): return self._wrap(self._s._col.rlike("^[0-9]+$"))

    def istitle(self):
        """Whitespace-word titlecase (initcap's word model); pandas
        additionally treats non-alpha boundaries as word starts."""
        c = self._s._col
        return self._wrap((c == F.initcap(F.lower(c))) & c.rlike("[A-Za-z]"))

    def encode(self, encoding: str = "utf-8"):
        return self._wrap(F.encode(self._s._col, encoding))

    def ljust(self, width, fillchar=" "):
        return self._wrap(F.rpad(self._s._col, width, fillchar))

    def rjust(self, width, fillchar=" "):
        return self._wrap(F.lpad(self._s._col, width, fillchar))

    def center(self, width, fillchar=" "):
        c = self._s._col
        left = (F.lit(width) - F.length(c)) / 2
        return self._wrap(F.rpad(
            F.lpad(c, (F.length(c) + F.floor(left)).cast("int"), fillchar),
            width, fillchar))

    def removeprefix(self, prefix: str):
        c = self._s._col
        return self._wrap(F.when(
            c.startswith(prefix),
            F.substring(c, len(prefix) + 1, 1 << 30)).otherwise(c))

    def removesuffix(self, suffix: str):
        c = self._s._col
        return self._wrap(F.when(
            c.endswith(suffix),
            F.substring(c, 1, F.length(c) - len(suffix))).otherwise(c))

    def slice_replace(self, start: int, stop: int, repl: str):
        c = self._s._col
        return self._wrap(F.concat(
            F.substring(c, 1, start), F.lit(repl),
            F.substring(c, stop + 1, 1 << 30)))

    def rsplit(self, pat=" ", n=1):
        """Split from the right: reverse, split on reversed pat, reverse
        parts and their order (reference series.py rsplit) -- stays a JVM
        expression chain."""
        rev = F.reverse(self._s._col)
        parts = F.split(rev, pat[::-1], n + 1)  # literal delimiters only
        return self._wrap(F.reverse(F.transform(parts, F.reverse)))


class _AiAccessor:
    """reference Series.ai namespace (series.py tokenize/embed/
    llm_generate): each call adds its output column to the parent frame
    via the mapInPandas operators in operators/ai.py.

    The series must be a direct column reference of its frame (the
    operators run over the whole frame with the column's name)."""

    def __init__(self, s: BodoSeries):
        self._s = s

    def tokenize(self, **kw) -> "BodoDataFrame":
        from .operators.ai import tokenize as _tok
        return BodoDataFrame(
            _tok(self._s._frame._df, text_col=self._s.name, **kw))

    def embed(self, **kw) -> "BodoDataFrame":
        from .operators.ai import embed as _emb
        return BodoDataFrame(
            _emb(self._s._frame._df, text_col=self._s.name, **kw))

    def llm_generate(self, **kw) -> "BodoDataFrame":
        from .operators.ai import llm_generate as _gen
        return BodoDataFrame(
            _gen(self._s._frame._df, prompt_col=self._s.name, **kw))


class _DtAccessor:
    """reference series.py dt accessor table -> F.* builtins."""

    def __init__(self, s: BodoSeries):
        self._s = s

    def _wrap(self, col: Column) -> BodoSeries:
        return BodoSeries(self._s._frame, col, self._s.name)

    @property
    def components(self) -> "BodoDataFrame":
        """pandas Timedelta .components over a day-time interval column
        (reference series.py:2396): days floor-divide (negative
        timedeltas get negative days and POSITIVE remainders, pandas
        semantics); sub-day parts are non-negative. Nanoseconds are 0:
        Spark intervals carry microsecond resolution."""
        us = (self._s._col.cast("decimal(30,6)")
              * F.lit(1000000)).cast("long")
        day_us = F.lit(86400000000)
        rem = F.pmod(us, day_us)
        days = ((us - rem) / day_us).cast("long")
        hours = F.floor(rem / F.lit(3600000000)).cast("long")
        rem_h = rem - hours * F.lit(3600000000)
        minutes = F.floor(rem_h / F.lit(60000000)).cast("long")
        rem_m = rem_h - minutes * F.lit(60000000)
        seconds = F.floor(rem_m / F.lit(1000000)).cast("long")
        rem_s = rem_m - seconds * F.lit(1000000)
        millis = F.floor(rem_s / F.lit(1000)).cast("long")
        micros = (rem_s - millis * F.lit(1000)).cast("long")
        return BodoDataFrame(self._s._frame._df.select(
            days.alias("days"), hours.alias("hours"),
            minutes.alias("minutes"), seconds.alias("seconds"),
            millis.alias("milliseconds"), micros.alias("microseconds"),
            F.lit(0).cast("long").alias("nanoseconds")))

    @property
    def year(self): return self._wrap(F.year(self._s._col))
    @property
    def month(self): return self._wrap(F.month(self._s._col))
    @property
    def day(self): return self._wrap(F.dayofmonth(self._s._col))
    @property
    def hour(self): return self._wrap(F.hour(self._s._col))
    @property
    def minute(self): return self._wrap(F.minute(self._s._col))
    @property
    def second(self): return self._wrap(F.second(self._s._col))
    @property
    def quarter(self): return self._wrap(F.quarter(self._s._col))
    @property
    def dayofweek(self): return self._wrap(F.weekday(self._s._col))  # Mon=0, pandas-compatible
    @property
    def dayofyear(self): return self._wrap(F.dayofyear(self._s._col))
    @property
    def date(self): return self._wrap(F.to_date(self._s._col))

    def floor(self, freq: str):
        unit = {"D": "day", "H": "hour", "T": "minute", "min": "minute"}[freq]
        return self._wrap(F.date_trunc(unit, self._s._col))

    def strftime(self, fmt: str):
        java_fmt = (fmt.replace("%Y", "yyyy").replace("%m", "MM")
                    .replace("%d", "dd").replace("%H", "HH")
                    .replace("%M", "mm").replace("%S", "ss"))
        return self._wrap(F.date_format(self._s._col, java_fmt))

    def tz_localize(self, tz: str):
        """Interpret naive wall-clock values as instants in ``tz``
        (reference series.py tz_localize -> to_utc_timestamp)."""
        return self._wrap(F.to_utc_timestamp(self._s._col, tz))

    @property
    def day_name(self):
        return self._wrap(F.date_format(self._s._col, "EEEE"))

    @property
    def month_name(self):
        return self._wrap(F.date_format(self._s._col, "MMMM"))

    @property
    def days_in_month(self):
        return self._wrap(F.dayofmonth(F.last_day(self._s._col)))

    @property
    def is_month_start(self):
        return self._wrap(F.dayofmonth(self._s._col) == 1)

    @property
    def is_month_end(self):
        c = self._s._col
        return self._wrap(F.to_date(c) == F.last_day(c))

    @property
    def week(self):
        return self._wrap(F.weekofyear(self._s._col))

    def normalize(self):
        """Midnight-floor (pandas dt.normalize)."""
        return self._wrap(F.date_trunc("day", self._s._col))

    @property
    def is_quarter_start(self):
        c = self._s._col
        return self._wrap(F.to_date(c)
                          == F.to_date(F.date_trunc("quarter", c)))

    @property
    def is_quarter_end(self):
        c = self._s._col
        return self._wrap(F.to_date(c) == F.date_sub(
            F.add_months(F.to_date(F.date_trunc("quarter", c)), 3), 1))

    @property
    def is_year_start(self):
        c = self._s._col
        return self._wrap((F.month(c) == 1) & (F.dayofmonth(c) == 1))

    @property
    def is_year_end(self):
        c = self._s._col
        return self._wrap((F.month(c) == 12) & (F.dayofmonth(c) == 31))

    @property
    def is_leap_year(self):
        y = F.year(self._s._col)
        return self._wrap((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)))

    @property
    def microsecond(self):
        # microseconds within the second, 0..999999 (pandas semantics;
        # pmod keeps pre-epoch timestamps positive)
        return self._wrap(F.pmod(F.unix_micros(self._s._col), 1_000_000))

    def ceil(self, freq: str):
        """Ceiling to a unit boundary: floor, then bump non-exact values
        one unit (pandas dt.ceil)."""
        unit = {"D": "day", "H": "hour", "T": "minute", "min": "minute",
                "S": "second"}[freq]
        step = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}[unit]
        c = self._s._col
        fl = F.date_trunc(unit, c)
        return self._wrap(F.when(c == fl, c).otherwise(
            F.timestamp_seconds(F.unix_timestamp(fl) + step)))

    def round(self, freq: str):
        """Round-half-even to a unit boundary (pandas dt.round)."""
        unit = {"D": "day", "H": "hour", "T": "minute", "min": "minute",
                "S": "second"}[freq]
        step = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}[unit]
        c = self._s._col
        us = F.unix_micros(c)
        half = step * 1_000_000 // 2
        down = (us / (step * 1_000_000)).cast("long")
        rem = us - down * step * 1_000_000
        up_even = F.when((rem > half)
                         | ((rem == half) & (down % 2 == 1)), down + 1) \
            .otherwise(down)
        return self._wrap(F.timestamp_seconds(up_even * step))

    def isocalendar(self) -> "BodoDataFrame":
        return BodoSeries(self._s._frame, self._s._col,
                          self._s.name).isocalendar()


# --------------------------------------------------------------------------
# DataFrame
# --------------------------------------------------------------------------
class BodoDataFrame:
    """Lazy pandas-like frame (reference bodo/pandas/frame.py)."""

    def __init__(self, df: SparkDF):
        self._df = df
        self._cached_len: int | None = None

    # -- plumbing
    @property
    def spark(self) -> SparkDF:
        """Escape hatch: the underlying pyspark DataFrame."""
        return self._df

    @property
    def columns(self) -> list[str]:
        return list(self._df.columns)

    @property
    def dtypes(self) -> pd.Series:
        return pd.Series({f.name: f.dataType.simpleString()
                          for f in self._df.schema.fields})

    def __len__(self) -> int:
        if self._cached_len is None:
            self._cached_len = self._df.count()
        return self._cached_len

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self), len(self.columns))

    def __repr__(self) -> str:
        return f"BodoDataFrame[{', '.join(self.columns)}]"

    # -- selection / projection / filter (reference plan.py:355,364)
    def __getitem__(self, key):
        if isinstance(key, str):
            return BodoSeries(self, F.col(key), key)
        if isinstance(key, list):
            return BodoDataFrame(self._df.select(*key))
        if isinstance(key, BodoSeries):  # boolean mask
            return BodoDataFrame(self._df.where(key._col))
        raise TypeError(f"unsupported key type {type(key)}")

    def __setitem__(self, name: str, value):
        if isinstance(value, BodoSeries):
            self._df = self._df.withColumn(name, value._col)
        else:
            self._df = self._df.withColumn(name, F.lit(value))
        self._cached_len = None if isinstance(value, BodoSeries) else self._cached_len

    @property
    def loc(self) -> "_LocIndexer":
        """df.loc (reference frame.py:94 BodoDataFrameLocIndexer): the
        reference keeps only df.loc[:, cols] lazy and falls back to
        pandas otherwise; a distributed frame has no positional index,
        so here the LAZY subset is the whole contract -- [:, cols],
        [mask], [mask, cols] -- and anything positional raises
        instead of silently collecting."""
        return _LocIndexer(self)

    def assign(self, **kwargs) -> "BodoDataFrame":
        df = self._df
        for name, v in kwargs.items():
            df = df.withColumn(name, v._col if isinstance(v, BodoSeries)
                               else F.lit(v))
        return BodoDataFrame(df)

    def query(self, expr: str) -> "BodoDataFrame":
        """reference frame.py:1563 (.query); SQL-dialect predicate."""
        return BodoDataFrame(self._df.where(F.expr(expr)))

    def rename(self, columns: Mapping[str, str]) -> "BodoDataFrame":
        df = self._df
        for old, new in columns.items():
            df = df.withColumnRenamed(old, new)
        return BodoDataFrame(df)

    def drop(self, columns: Iterable[str]) -> "BodoDataFrame":
        return BodoDataFrame(self._df.drop(*columns))

    def astype(self, dtypes: Mapping[str, Any]) -> "BodoDataFrame":
        df = self._df
        for c, t in dtypes.items():
            df = df.withColumn(c, F.col(c).cast(_dtype_to_spark(t)))
        return BodoDataFrame(df)

    def fillna(self, value) -> "BodoDataFrame":
        return BodoDataFrame(self._df.fillna(value))

    def dropna(self, subset: list[str] | None = None) -> "BodoDataFrame":
        return BodoDataFrame(self._df.dropna(subset=subset))

    def isin_frame(self, col: str, other: "BodoDataFrame",
                   other_col: str) -> "BodoDataFrame":
        """Series.isin(Series) -> left-semi join (reference
        frame.py:2106 get_isin_filter_plan)."""
        return BodoDataFrame(self._df.join(
            other._df.select(F.col(other_col).alias("__isin_k")).distinct(),
            F.col(col) == F.col("__isin_k"), "left_semi"))

    # -- joins (reference frame.py:1061 merge)
    def merge(self, right: "BodoDataFrame", how: str = "inner",
              on: str | list[str] | None = None,
              left_on: str | list[str] | None = None,
              right_on: str | list[str] | None = None,
              suffixes: tuple[str, str] = ("_x", "_y"),
              broadcast: bool = False) -> "BodoDataFrame":
        how_map = {"inner": "inner", "left": "left", "right": "right",
                   "outer": "full_outer", "cross": "cross",
                   "semi": "left_semi", "anti": "left_anti"}
        spark_how = how_map[how]
        rdf = F.broadcast(right._df) if broadcast else right._df
        if how == "cross":
            return BodoDataFrame(self._df.crossJoin(rdf))
        if on is not None:
            left_on = right_on = on
        lk = [left_on] if isinstance(left_on, str) else list(left_on)
        rk = [right_on] if isinstance(right_on, str) else list(right_on)
        # disambiguate overlapping columns like pandas suffixes; when
        # lk == rk the shared key merges to one unsuffixed column, but
        # with differing keys pandas suffixes an overlapping name even
        # when it is a join key on one side -- so the join condition
        # must reference post-rename names
        overlap = (set(self.columns) & set(right.columns)) - \
            (set(lk) & set(rk))
        lmap = {c: c + suffixes[0] for c in overlap}
        rmap = {c: c + suffixes[1] for c in overlap}
        ldf = self._df
        for c in overlap:
            ldf = ldf.withColumnRenamed(c, lmap[c])
            rdf = rdf.withColumnRenamed(c, rmap[c])
        if lk == rk:
            out = ldf.join(rdf, on=lk, how=spark_how)
        else:
            cond = None
            for a, b in zip(lk, rk):
                c = ldf[lmap.get(a, a)] == rdf[rmap.get(b, b)]
                cond = c if cond is None else cond & c
            out = ldf.join(rdf, cond, spark_how)
        return BodoDataFrame(out)

    # -- dedup / set ops
    def drop_near_duplicates(self, id_col: str, text_col: str,
                             threshold: float = 0.5,
                             **minhash_kw) -> "BodoDataFrame":
        """One-call near-dup removal: MinHash+LSH pairs -> connected
        components -> keep the lowest id per cluster (operators/dedup).
        The corpus-dedup primitive as a frame method."""
        from .operators.dedup import dedup_survivors, minhash_lsh_pairs
        pairs = minhash_lsh_pairs(self._df, id_col=id_col,
                                  text_col=text_col,
                                  threshold=threshold, **minhash_kw)
        return BodoDataFrame(dedup_survivors(self._df, pairs, id_col))

    def gopher_filter(self, text_col: str = "text",
                      **thresholds) -> "BodoDataFrame":
        """Gopher quality rules as a frame filter
        (operators/text.gopher_filter)."""
        from .operators.text import gopher_filter
        return BodoDataFrame(gopher_filter(self._df, text_col,
                                           **thresholds))

    def cap_per_domain(self, cap: int, domain_col: str = "source",
                       id_col: str = "doc_id") -> "BodoDataFrame":
        """At most ``cap`` deterministic rows per domain (skew-safe
        two-level top-k; operators/curation.cap_per_key)."""
        from .operators.curation import cap_per_key
        return BodoDataFrame(cap_per_key(self._df, cap,
                                         key_col=domain_col,
                                         id_col=id_col))

    def weighted_sample(self, n: int, weight_col: str,
                        id_col: str = "doc_id") -> "BodoDataFrame":
        """Deterministic weighted sampling without replacement
        (operators/curation.weighted_sample, Efraimidis-Spirakis)."""
        from .operators.curation import weighted_sample
        return BodoDataFrame(weighted_sample(self._df, n,
                                             weight_col=weight_col,
                                             id_col=id_col))

    def dataset_profile(self, by: str = "source",
                        text_col: str = "text",
                        lang_col: str | None = "lang",
                        **kw) -> "BodoDataFrame":
        """One-pass per-domain data card
        (operators/sketches.dataset_profile)."""
        from .operators.sketches import dataset_profile
        return BodoDataFrame(dataset_profile(self._df, by=by,
                                             text_col=text_col,
                                             lang_col=lang_col, **kw))

    def drop_url_duplicates(self, url_col: str = "url",
                            id_col: str = "doc_id",
                            score_col: str | None = None,
                            **canon_kw) -> "BodoDataFrame":
        """One row per canonical URL (operators/web.url_dedup): the
        C4/RefinedWeb pre-content dedup as a frame method."""
        from .operators.web import url_dedup
        return BodoDataFrame(url_dedup(self._df, url_col=url_col,
                                       id_col=id_col,
                                       score_col=score_col, **canon_kw))

    def bm25_search(self, queries, *, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 10,
                    **bm25_kw) -> "BodoDataFrame":
        """BM25 top-k over this frame's text against a query frame
        (operators/retrieval): builds the inverted index and ranks in
        one call; for repeated serving build the index once with
        bm25_index and call bm25_topk directly."""
        from .operators.retrieval import bm25_index, bm25_topk
        postings = bm25_index(self._df, id_col=id_col,
                              text_col=text_col)
        q = queries._df if isinstance(queries, BodoDataFrame) else queries
        return BodoDataFrame(bm25_topk(postings, q, k=k, **bm25_kw))

    def funnel(self, steps: list[str], **kw) -> "BodoDataFrame":
        """Per-user ordered-funnel progression
        (operators/timebucket.funnel_stages)."""
        from .operators.timebucket import funnel_stages
        return BodoDataFrame(funnel_stages(self._df, steps, **kw))

    def winsorize(self, value_col: str, **kw) -> "BodoDataFrame":
        """Percentile outlier clipping
        (operators/curation.winsorize)."""
        from .operators.curation import winsorize
        return BodoDataFrame(winsorize(self._df, value_col, **kw))

    def interpolate(self, *, group_cols: list[str], order_col: str,
                    value_col: str, **kw) -> "BodoDataFrame":
        """Linear interpolation of NULL gaps over an ordered series
        (operators/timebucket.interpolate_linear)."""
        from .operators.timebucket import interpolate_linear
        return BodoDataFrame(interpolate_linear(
            self._df, group_cols=group_cols, order_col=order_col,
            value_col=value_col, **kw))

    def scd2_apply(self, changes, *, key: list[str], tracked: list[str],
                   batch_ts, **kw) -> "BodoDataFrame":
        """SCD2 dimension maintenance (operators/merge.scd2_apply);
        this frame is the dimension, ``changes`` the batch."""
        from .operators.merge import scd2_apply
        ch = changes._df if isinstance(changes, BodoDataFrame) else changes
        return BodoDataFrame(scd2_apply(self._df, ch, key=key,
                                        tracked=tracked,
                                        batch_ts=batch_ts, **kw))

    def drop_duplicates(self, subset: list[str] | None = None) -> "BodoDataFrame":
        return BodoDataFrame(self._df.dropDuplicates(subset))

    def distinct(self) -> "BodoDataFrame":
        return BodoDataFrame(self._df.distinct())

    # -- sort / limit / sample (reference 2.6)
    def sort_values(self, by: str | list[str], ascending=True,
                    na_position: str = "last") -> "BodoDataFrame":
        bys = [by] if isinstance(by, str) else list(by)
        ascs = [ascending] * len(bys) if isinstance(ascending, bool) \
            else list(ascending)
        cols = []
        for b, a in zip(bys, ascs):
            c = F.col(b)
            if a:
                c = c.asc_nulls_last() if na_position == "last" else c.asc_nulls_first()
            else:
                c = c.desc_nulls_last() if na_position == "last" else c.desc_nulls_first()
            cols.append(c)
        return BodoDataFrame(self._df.orderBy(*cols))

    def head(self, n: int = 5) -> "BodoDataFrame":
        return BodoDataFrame(self._df.limit(n))

    # -- partitioning / caching escape hatches (the knobs the reference
    # exposes as distribution hints; on Spark they are first-class)
    def repartition(self, n: int | None = None, *cols: str) -> "BodoDataFrame":
        """Hash-repartition by columns (co-location before repeated
        joins/aggs on the same key) or round-robin to n partitions."""
        if cols:
            args = ([n] if n else []) + [F.col(c) for c in cols]
            return BodoDataFrame(self._df.repartition(*args))
        return BodoDataFrame(self._df.repartition(n))

    def coalesce(self, n: int) -> "BodoDataFrame":
        return BodoDataFrame(self._df.coalesce(n))

    def cache(self) -> "BodoDataFrame":
        self._df.persist()
        return self

    def unpersist(self) -> "BodoDataFrame":
        self._df.unpersist()
        return self

    @property
    def empty(self) -> bool:
        return len(self) == 0

    @property
    def ndim(self) -> int:
        return 2

    def isna(self) -> "BodoDataFrame":
        """Elementwise null mask (pandas df.isna)."""
        return BodoDataFrame(self._df.select(
            *[F.col(c).isNull().alias(c) for c in self._df.columns]))

    def notna(self) -> "BodoDataFrame":
        return BodoDataFrame(self._df.select(
            *[F.col(c).isNotNull().alias(c) for c in self._df.columns]))

    def isnull(self) -> "BodoDataFrame":
        return self.isna()

    def notnull(self) -> "BodoDataFrame":
        return self.notna()

    def duplicated(self, subset: list[str] | None = None,
                   order_by: str | None = None) -> "BodoSeries":
        """pandas df.duplicated(keep='first') as a boolean Series:
        row_number within the key group > 1. ``order_by`` defines which
        row is 'first' (no implicit row order on a distributed frame);
        like pandas, the default key set is ALL columns -- pass
        ``subset`` to exclude e.g. a unique id."""
        if order_by is None:
            raise ValueError("duplicated() needs order_by=<col>: "
                             "distributed frames have no implicit order")
        keys = list(subset) if subset else list(self._df.columns)
        w = W.partitionBy(*keys).orderBy(order_by)
        return BodoSeries(self, F.row_number().over(w) > 1, "duplicated")

    def insert(self, loc: int, column: str, value) -> None:
        """pandas df.insert: in-place column insertion at position."""
        col = value._col if isinstance(value, BodoSeries) else F.lit(value)
        names = list(self._df.columns)
        names.insert(loc, "__ins__")
        self._df = self._df.withColumn("__ins__", col).select(
            *[F.col(n).alias(column if n == "__ins__" else n)
              for n in names])

    def join(self, other: "BodoDataFrame", on: str | list[str],
             how: str = "left", lsuffix: str = "",
             rsuffix: str = "") -> "BodoDataFrame":
        """pandas df.join (key-column form): a merge with suffix
        control."""
        return merge(self, other, on=on, how=how,
                     suffixes=(lsuffix or "_x", rsuffix or "_y"))

    def pipe(self, func: Callable, *args, **kwargs):
        return func(self, *args, **kwargs)

    def pivot(self, index: str, columns: str, values: str) -> "BodoDataFrame":
        """pandas df.pivot (no aggregation -- first value per cell; a
        real duplicate would be a pandas error, here it's arbitrary-
        first)."""
        return BodoDataFrame(self._df.groupBy(index).pivot(columns)
                             .agg(F.first(values)).orderBy(index))

    def select_dtypes(self, include: str | list[str]) -> "BodoDataFrame":
        """pandas select_dtypes over Spark simpleString type names
        (e.g. 'bigint', 'double', 'string', 'number')."""
        inc = [include] if isinstance(include, str) else list(include)
        numeric = {"bigint", "int", "smallint", "tinyint", "double",
                   "float", "decimal"}
        keep = []
        for f in self._df.schema.fields:
            t = f.dataType.simpleString().split("(")[0]
            if t in inc or ("number" in inc and t in numeric):
                keep.append(f.name)
        return BodoDataFrame(self._df.select(*keep))

    def explode(self, column: str) -> "BodoDataFrame":
        """pandas df.explode: one row per array element; empty/null
        arrays keep one row with a null element (explode_outer)."""
        others = [c for c in self._df.columns if c != column]
        return BodoDataFrame(self._df.select(
            *others, F.explode_outer(F.col(column)).alias(column))
            .select(*self._df.columns))

    def nsmallest(self, n: int, columns: str | list[str]) -> "BodoDataFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return BodoDataFrame(
            self._df.orderBy(*[F.col(c).asc() for c in cols]).limit(n))

    def nlargest(self, n: int, columns: str | list[str]) -> "BodoDataFrame":
        return self.sort_values(columns, ascending=False).head(n)

    def sample(self, frac: float, seed: int | None = None) -> "BodoDataFrame":
        return BodoDataFrame(self._df.sample(fraction=frac, seed=seed))

    # -- groupby (reference bodo/pandas/groupby.py)
    def groupby(self, by: str | list[str]) -> "BodoGroupBy":
        return BodoGroupBy(self, [by] if isinstance(by, str) else list(by))

    # -- reshaping
    def melt(self, id_vars: list[str], value_vars: list[str],
             var_name: str = "variable", value_name: str = "value"
             ) -> "BodoDataFrame":
        return BodoDataFrame(self._df.unpivot(
            id_vars, value_vars, var_name, value_name))

    def pivot_table(self, index: str, columns: str, values: str,
                    aggfunc: str = "sum") -> "BodoDataFrame":
        agg = getattr(F, {"sum": "sum", "mean": "avg", "count": "count",
                          "min": "min", "max": "max"}[aggfunc])
        return BodoDataFrame(
            self._df.groupBy(index).pivot(columns).agg(agg(values)))

    # -- UDF surfaces (reference 2.9)
    def apply(self, func: Callable[[pd.Series], Any], axis: int = 1,
              return_type: str = "string",
              result_name: str = "apply_out") -> "BodoDataFrame":
        """Row-wise apply as an Arrow-batched pandas UDF over a struct of
        all columns (reference frame.py:1410 df.apply(axis=1))."""
        if axis != 1:
            raise NotImplementedError("only axis=1")
        from pyspark.sql.functions import pandas_udf
        cols = self.columns

        @pandas_udf(return_type)
        def _u(s: pd.DataFrame) -> pd.Series:
            return s.apply(func, axis=1)

        return BodoDataFrame(self._df.withColumn(
            result_name, _u(F.struct(*[F.col(c) for c in cols]))))

    def map_partitions(self, func: Callable[[pd.DataFrame], pd.DataFrame],
                       schema: str) -> "BodoDataFrame":
        """reference series.py:857 map_partitions -> mapInPandas."""
        def gen(batches):
            for pdf in batches:
                yield func(pdf)
        return BodoDataFrame(self._df.mapInPandas(gen, schema))

    def map_partitions_with_state(
            self, init_state_fn: Callable[[], Any],
            func: Callable[[Any, pd.DataFrame], pd.DataFrame],
            schema: str) -> "BodoDataFrame":
        """reference series.py:857 map_partitions_with_state: ``init_
        state_fn()`` runs ONCE per partition (model handle, client,
        compiled regex...) and its result is passed to every batch --
        the per-worker-init pattern an expensive-setup UDF needs.
        State is created inside the executor task, never serialized
        from the driver."""
        def gen(batches):
            state = init_state_fn()
            for pdf in batches:
                yield func(state, pdf)
        return BodoDataFrame(self._df.mapInPandas(gen, schema))

    def rolling(self, window: int, order_by: str,
                partition_by: str | None = None,
                allow_global: bool = False,
                min_periods: int | None = None) -> "BodoRolling":
        """reference bodo/hiframes/rolling.py; fixed windows over an
        explicit ordering (no implicit row order at scale).

        Without ``partition_by`` the whole frame is one Spark window
        partition -- a single task processes every row, which is a
        scale-killer on anything but small frames. Pass a partition key,
        or ``allow_global=True`` to acknowledge the single-task plan.
        """
        if partition_by is None and not allow_global:
            raise ValueError(
                "rolling() without partition_by executes as ONE task (a "
                "global window over lit(1)); pass partition_by=<key>, or "
                "allow_global=True if the frame is known to be small")
        return BodoRolling(self, window, order_by, partition_by,
                           min_periods)

    # -- stats
    def describe(self, cols: list[str] | None = None) -> pd.DataFrame:
        return self._df.describe(*(cols or [])).toPandas()

    def corr_matrix(self, cols: list[str]) -> pd.DataFrame:
        """Pairwise Pearson correlations as a square pandas matrix --
        all n*(n-1)/2 pairs in ONE aggregation pass."""
        return self._pair_matrix(cols, F.corr)

    def cov_matrix(self, cols: list[str]) -> pd.DataFrame:
        """Pairwise sample covariances (one pass; diagonal = variance)."""
        return self._pair_matrix(cols, F.covar_samp)

    def _pair_matrix(self, cols: list[str], fn) -> pd.DataFrame:
        aggs = [fn(F.col(a), F.col(b)).alias(f"{i}_{j}")
                for i, a in enumerate(cols)
                for j, b in enumerate(cols) if i <= j]
        row = self._df.agg(*aggs).collect()[0]
        import numpy as np
        m = np.empty((len(cols), len(cols)))
        for i in range(len(cols)):
            for j in range(len(cols)):
                m[i, j] = row[f"{min(i, j)}_{max(i, j)}"]
        return pd.DataFrame(m, index=cols, columns=cols)

    def freq_items(self, cols: list[str], support: float = 0.01) -> dict:
        """Heavy hitters per column (Karp-Papadimitriou-Shenker single
        pass -- Spark's df.stat.freqItems; the reference's sketch family
        delegates to theta sketches). Approximate: may contain false
        positives, never misses an item above ``support``."""
        row = self._df.stat.freqItems(cols, support).collect()[0]
        return {c: sorted(row[f"{c}_freqItems"]) for c in cols}

    def approx_quantile(self, col: str, probs: list[float],
                        rel_err: float = 0.01) -> list[float]:
        """Greenwald-Khanna approximate quantiles (single pass,
        mergeable -- the scale path; Series.quantile is the exact one)."""
        return self._df.approxQuantile(col, probs, rel_err)

    def hll_sketch(self, col: str, lg_k: int = 12) -> bytes:
        """Mergeable DataSketches HLL sketch of a column (the engine
        analogue of the reference's theta-sketch NDV family): build
        once, union across shards/days with hll_union, estimate
        anywhere. Returns the serialized sketch."""
        return self._df.agg(
            F.hll_sketch_agg(col, F.lit(lg_k)).alias("s")).collect()[0]["s"]

    def approx_nunique_sketch(self, col: str, lg_k: int = 12) -> int:
        """NDV estimate via the HLL sketch (single pass, mergeable)."""
        row = self._df.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(col, F.lit(lg_k))).alias("n")).collect()[0]
        return int(row["n"])

    # -- materialization / sinks
    def to_pandas(self) -> pd.DataFrame:
        return self._df.toPandas()

    collect = to_pandas

    def to_parquet(self, path: str, mode: str = "overwrite",
                   partition_cols: Iterable[str] | None = None) -> None:
        from .sources.io import to_parquet as _tp
        _tp(self._df, path, mode=mode, partition_cols=partition_cols)

    def to_csv(self, path: str, **kw) -> None:
        from .sources.io import to_csv as _tc
        _tc(self._df, path, **kw)

    def to_json(self, path: str, **kw) -> None:
        from .sources.io import to_json as _tj
        _tj(self._df, path, **kw)

    def to_sql(self, table: str, url: str, **kw) -> None:
        from .sources.io import to_sql as _ts
        _ts(self._df, table, url, **kw)

    def to_iceberg(self, table: str, **kw) -> None:
        from .sources.io import to_iceberg as _ti
        _ti(self._df, table, **kw)

    def to_s3_vectors(self, id_col: str, vec_col: str, **kw):
        """reference frame.py:721; sink seam in operators/ai.py."""
        from .operators.ai import to_vector_sink as _tv
        return _tv(self._df, id_col, vec_col, **kw)

    # -- small pandas-parity helpers (lazy frames are immutable: copy
    # and reset_index return the same plan; no index is carried)
    def copy(self) -> "BodoDataFrame":
        return BodoDataFrame(self._df)

    def reset_index(self, drop: bool = True) -> "BodoDataFrame":
        if not drop:
            raise ValueError("no materialized index to restore; use "
                             "monotonically-increasing keys explicitly")
        return BodoDataFrame(self._df)

    def filter(self, items: Iterable[str]) -> "BodoDataFrame":
        """pandas df.filter(items=...): column subset."""
        return BodoDataFrame(self._df.select(*list(items)))

    def get(self, col: str, default=None):
        return self[col] if col in self._df.columns else default

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)


class _LocIndexer:
    """Lazy df.loc: [:, cols], [bool_mask], [bool_mask, cols]."""

    def __init__(self, frame: "BodoDataFrame"):
        self._frame = frame

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            rows, cols = key
            if isinstance(cols, tuple):
                cols = list(cols)
            if isinstance(rows, slice):
                if rows != slice(None, None, None):
                    raise NotImplementedError(
                        "df.loc positional slices need a row order a "
                        "distributed frame doesn't define; use a boolean "
                        "mask or sort_values().head()")
                return self._frame[cols]
            if isinstance(rows, BodoSeries):
                filtered = BodoDataFrame(self._frame._df.where(rows._col))
                return filtered[cols]
            raise NotImplementedError(
                f"df.loc row selector {type(rows).__name__} not supported "
                "on a distributed frame (no positional index)")
        if isinstance(key, BodoSeries):
            return BodoDataFrame(self._frame._df.where(key._col))
        if isinstance(key, slice) and key == slice(None, None, None):
            return self._frame
        raise NotImplementedError(
            f"df.loc[{type(key).__name__}] not supported on a "
            "distributed frame (no positional index)")


class BodoGroupBy:
    """reference bodo/pandas/groupby.py:159 (named aggs, fn strings,
    applyInPandas)."""

    _FN = {"sum": F.sum, "mean": F.avg, "avg": F.avg, "min": F.min,
           "max": F.max, "count": F.count, "nunique": F.countDistinct,
           "std": F.stddev_samp, "var": F.var_samp,
           # pandas groupby.first/last = first/last NON-null
           "first": (lambda c: F.first(c, ignorenulls=True)),
           "last": (lambda c: F.last(c, ignorenulls=True)),
           "median": F.median,
           "skew": F.skewness, "kurt": F.kurtosis,
           "all": F.bool_and, "any": F.bool_or,
           "collect_list": F.collect_list, "collect_set": F.collect_set}

    def __init__(self, frame: BodoDataFrame, keys: list[str]):
        self._frame = frame
        self._keys = keys

    def agg(self, spec: Mapping[str, str | list[str]] | None = None,
            **named) -> BodoDataFrame:
        exprs: list[Column] = []
        if spec:
            for col, fns in spec.items():
                for fn in ([fns] if isinstance(fns, str) else fns):
                    exprs.append(self._FN[fn](col).alias(
                        f"{col}_{fn}" if not isinstance(fns, str) else col))
        for out_name, (col, fn) in named.items():
            exprs.append(self._FN[fn](col).alias(out_name))
        return BodoDataFrame(
            self._frame._df.groupBy(*self._keys).agg(*exprs))

    def _simple(self, fn: str, cols: list[str] | None = None) -> BodoDataFrame:
        cols = cols or [c for c in self._frame.columns if c not in self._keys]
        exprs = [self._FN[fn](c).alias(c) for c in cols]
        return BodoDataFrame(self._frame._df.groupBy(*self._keys).agg(*exprs))

    def sum(self, cols=None): return self._simple("sum", cols)
    def mean(self, cols=None): return self._simple("mean", cols)
    def min(self, cols=None): return self._simple("min", cols)
    def max(self, cols=None): return self._simple("max", cols)
    def count(self, cols=None): return self._simple("count", cols)
    def nunique(self, cols=None): return self._simple("nunique", cols)
    def first(self, cols=None): return self._simple("first", cols)
    def last(self, cols=None): return self._simple("last", cols)
    def median(self, cols=None): return self._simple("median", cols)
    def std(self, cols=None): return self._simple("std", cols)
    def var(self, cols=None): return self._simple("var", cols)

    def prod(self, cols=None) -> BodoDataFrame:
        cols = cols or [c for c in self._frame.columns
                        if c not in self._keys]
        return BodoDataFrame(self._frame._df.groupBy(*self._keys)
                             .agg(*[F.product(c).alias(c) for c in cols]))

    def aggregate(self, *a, **kw): return self.agg(*a, **kw)

    def pipe(self, func: Callable, *args, **kwargs):
        return func(self, *args, **kwargs)

    def shift(self, col: str, periods: int = 1,
              order_by: str | None = None) -> BodoDataFrame:
        """groupby.shift (reference groupby shift ftype): lag within
        each group over an explicit ordering."""
        if order_by is None:
            raise ValueError("groupby.shift() needs order_by=<col>")
        w = W.partitionBy(*self._keys).orderBy(order_by)
        fn = F.lag(col, periods) if periods >= 0 else F.lead(col, -periods)
        return BodoDataFrame(self._frame._df.withColumn(
            f"{col}_shift", fn.over(w)))

    def value_counts(self, col: str) -> BodoDataFrame:
        """SeriesGroupBy.value_counts: per-group value frequencies,
        descending count then value (pandas order)."""
        return BodoDataFrame(
            self._frame._df.groupBy(*self._keys, col)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(*self._keys, F.col("count").desc(), col))

    def rolling(self, window: int, order_by: str,
                min_periods: int | None = None) -> "BodoRolling":
        """groupby.rolling (reference groupby/rolling.md): the frame's
        rolling with the group keys as the window partition -- the
        scale path by construction."""
        if len(self._keys) != 1:
            raise NotImplementedError("groupby.rolling supports one key")
        return self._frame.rolling(window, order_by=order_by,
                                   partition_by=self._keys[0],
                                   min_periods=min_periods)

    def size(self) -> BodoDataFrame:
        return BodoDataFrame(self._frame._df.groupBy(*self._keys)
                             .agg(F.count(F.lit(1)).alias("size")))

    def apply(self, func: Callable[[pd.DataFrame], pd.DataFrame],
              schema: str) -> BodoDataFrame:
        """groupby.apply -> applyInPandas (reference groupby.py:159;
        full shuffle on the keys, Arrow both ways)."""
        return BodoDataFrame(
            self._frame._df.groupBy(*self._keys).applyInPandas(func, schema))

    def filter(self, func: Callable[[pd.DataFrame], bool]) -> BodoDataFrame:
        """pandas groupby.filter: keep whole groups where ``func(group)``
        is truthy (Arrow-batched per-group evaluation)."""
        schema = self._frame._df.schema

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return pdf if func(pdf) else pdf.iloc[0:0]

        return BodoDataFrame(
            self._frame._df.groupBy(*self._keys).applyInPandas(fn, schema))

    def transform(self, col: str, fn: str = "mean") -> BodoDataFrame:
        """pandas groupby.transform: the group aggregate broadcast back
        onto every member row -- a window aggregate partitioned on the
        keys (one shuffle, no join-back)."""
        w = W.partitionBy(*self._keys)
        out = self._FN[fn](F.col(col)).over(w)
        return BodoDataFrame(self._frame._df.withColumn(
            f"{col}_{fn}", out))

    def idxmin(self, col: str, index_col: str) -> BodoDataFrame:
        """pandas groupby.idxmin (reference groupby ftype idxmin): the
        ``index_col`` value at each group's minimum of ``col``. pandas
        uses the implicit index; a distributed frame has none, so the
        index column is explicit. One hash aggregate (min_by)."""
        return BodoDataFrame(self._frame._df.groupBy(*self._keys).agg(
            F.min_by(index_col, col).alias(f"{col}_idxmin")))

    def idxmax(self, col: str, index_col: str) -> BodoDataFrame:
        """pandas groupby.idxmax (reference groupby ftype idxmax)."""
        return BodoDataFrame(self._frame._df.groupBy(*self._keys).agg(
            F.max_by(index_col, col).alias(f"{col}_idxmax")))

    def ngroup(self) -> BodoDataFrame:
        """pandas groupby.ngroup (reference ftype ngroup): each row
        tagged with its group's ordinal, groups numbered by key order
        (pandas numbers by first appearance -- meaningless on an
        unordered distributed frame, so key order is the documented
        contract). Scale path: the enumeration window runs over the
        DISTINCT-keys frame only (#groups rows, not #rows), then hash
        joins back; the full frame is never single-tasked."""
        keys = self._keys
        groups = (self._frame._df.select(*keys).distinct()
                  .withColumn("ngroup",
                              F.dense_rank().over(W.orderBy(*keys)) - 1))
        return BodoDataFrame(self._frame._df.join(groups, keys))

    def head(self, n: int, order_by: str) -> BodoDataFrame:
        """First ``n`` rows per group under an EXPLICIT ordering
        (pandas keeps insertion order; a distributed frame has none) --
        planned as WindowGroupLimit, no full sort."""
        w = W.partitionBy(*self._keys).orderBy(order_by)
        return BodoDataFrame(
            self._frame._df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))

    def cumsum(self, col: str, order_by: str) -> BodoDataFrame:
        """Distributed cumulative sum (reference MPI_Exscan path,
        distributed_api.py:2205) = window prefix sum."""
        return self._cum(col, order_by, F.sum, "cumsum")

    def cumprod(self, col: str, order_by: str) -> BodoDataFrame:
        return self._cum(col, order_by, F.product, "cumprod")

    def cummax(self, col: str, order_by: str) -> BodoDataFrame:
        return self._cum(col, order_by, F.max, "cummax")

    def cummin(self, col: str, order_by: str) -> BodoDataFrame:
        return self._cum(col, order_by, F.min, "cummin")

    def _cum(self, col: str, order_by: str, fn, tag: str) -> BodoDataFrame:
        """Group cumulatives (reference groupby ftypes cumsum/cumprod/
        cummin/cummax) as window prefix aggregates."""
        w = (W.partitionBy(*self._keys).orderBy(order_by)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return BodoDataFrame(self._frame._df.withColumn(
            f"{col}_{tag}", fn(col).over(w)))


class _SeriesRolling:
    """Series-scoped view over BodoRolling: each agg returns a
    BodoSeries of the rolled column (pandas Series.rolling shape)."""

    def __init__(self, roll: "BodoRolling", col: str):
        self._roll = roll
        self._col = col

    def _one(self, method: str, suffix: str) -> "BodoSeries":
        out = getattr(self._roll, method)(self._col)
        name = f"{self._col}_roll_{suffix}"
        return BodoSeries(out, F.col(name), name)

    def sum(self): return self._one("sum", "sum")
    def mean(self): return self._one("mean", "mean")
    def min(self): return self._one("min", "min")
    def max(self): return self._one("max", "max")
    def count(self): return self._one("count", "count")
    def std(self): return self._one("std", "std")
    def var(self): return self._one("var", "var")
    def median(self): return self._one("median", "median")


class BodoRolling:
    """reference bodo/hiframes/rolling.py:28 (fixed windows), :85
    (cov/corr pairs), :165 (apply)."""

    def __init__(self, frame: BodoDataFrame, window: int, order_by: str,
                 partition_by: str | None, min_periods: int | None = None):
        self._frame = frame
        base = (W.partitionBy(partition_by) if partition_by
                else W.partitionBy(F.lit(1)))
        self._w = base.orderBy(order_by).rowsBetween(-(window - 1), 0)
        self._window = window
        # pandas: results emit once the window holds >= min_periods
        # values (default: the full window)
        self._min_periods = window if min_periods is None else min_periods
        self._order_by = order_by
        self._partition_by = partition_by

    def _roll(self, col: str, fn, suffix: str) -> BodoDataFrame:
        n = F.count(F.lit(1)).over(self._w)
        val = F.when(n >= self._min_periods, fn(F.col(col)).over(self._w))
        return BodoDataFrame(self._frame._df.withColumn(
            f"{col}_roll_{suffix}", val))

    def _roll2(self, a: str, b: str, fn, suffix: str) -> BodoDataFrame:
        n = F.count(F.lit(1)).over(self._w)
        val = F.when(n >= self._min_periods,
                     fn(F.col(a), F.col(b)).over(self._w))
        return BodoDataFrame(self._frame._df.withColumn(
            f"{a}_{b}_roll_{suffix}", val))

    def sum(self, col: str): return self._roll(col, F.sum, "sum")
    def mean(self, col: str): return self._roll(col, F.avg, "mean")
    def min(self, col: str): return self._roll(col, F.min, "min")
    def max(self, col: str): return self._roll(col, F.max, "max")
    def count(self, col: str): return self._roll(col, F.count, "count")
    def std(self, col: str): return self._roll(col, F.stddev_samp, "std")
    def var(self, col: str): return self._roll(col, F.var_samp, "var")

    def median(self, col: str):
        """Exact windowed median. Spark's median aggregate rejects window
        frames, so sort the collected frame (exactly `window` values
        whenever a result is emitted) and index the middle -- all JVM
        expressions, no Python."""
        w = self._window
        arr = F.sort_array(F.collect_list(F.col(col)).over(self._w))
        if w % 2:
            med = F.element_at(arr, (w + 1) // 2).cast("double")
        else:
            med = (F.element_at(arr, w // 2).cast("double")
                   + F.element_at(arr, w // 2 + 1).cast("double")) / 2
        n = F.count(F.lit(1)).over(self._w)
        # median indexes assume a FULL window; with min_periods the
        # partial frame is sorted and indexed by its own size
        if self._min_periods < w:
            arr = F.sort_array(F.collect_list(F.col(col)).over(self._w))
            sz = F.size(arr)
            med = F.when(
                sz % 2 == 1,
                F.element_at(arr, ((sz + 1) / 2).cast("int")).cast("double")
            ).otherwise(
                (F.element_at(arr, (sz / 2).cast("int")).cast("double")
                 + F.element_at(arr, (sz / 2 + 1).cast("int")).cast("double"))
                / 2)
        return BodoDataFrame(self._frame._df.withColumn(
            f"{col}_roll_median", F.when(n >= self._min_periods, med)))

    def cov(self, a: str, b: str):
        """Pairwise rolling covariance (reference rolling.py:85)."""
        return self._roll2(a, b, F.covar_samp, "cov")

    def corr(self, a: str, b: str):
        """Pairwise rolling correlation (reference rolling.py:85)."""
        return self._roll2(a, b, F.corr, "corr")

    def apply(self, col: str, func) -> BodoDataFrame:
        """pandas rolling-apply semantics via applyInPandas (reference
        rolling.py:165): each partition key's rows are one pandas group,
        func sees a raw ndarray per window, result is a double column.
        Arrow-batched, one shuffle on the partition key; without
        partition_by the opt-in single-group plan is honored as-is."""
        from pyspark.sql import types as T

        df = self._frame._df
        window, order, out = self._window, self._order_by, \
            f"{col}_roll_apply"
        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(out, T.DoubleType())])

        mp = self._min_periods

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order)
            pdf[out] = pdf[col].rolling(window, min_periods=mp) \
                .apply(func, raw=True)
            return pdf

        grouped = (df.groupBy(self._partition_by) if self._partition_by
                   else df.groupBy(F.lit(1).alias("__g")))
        return BodoDataFrame(grouped.applyInPandas(fn, schema=schema))


# --------------------------------------------------------------------------
# module-level constructors (reference bodo/pandas/base.py)
# --------------------------------------------------------------------------
def read_parquet(path: str, columns: list[str] | None = None,
                 **kw) -> BodoDataFrame:
    from .sources.io import read_parquet as _rp
    return BodoDataFrame(_rp(path, columns=columns, **kw))


def read_csv(path: str, **kw) -> BodoDataFrame:
    from .sources.io import read_csv as _rc
    return BodoDataFrame(_rc(path, **kw))


def from_pandas(pdf: pd.DataFrame, **kw) -> BodoDataFrame:
    from .sources.io import from_pandas as _fp
    return BodoDataFrame(_fp(pdf, **kw))


def concat(frames: list[BodoDataFrame]) -> BodoDataFrame:
    """reference base.py:588 -> unionByName(allowMissingColumns)."""
    out = frames[0]._df
    for f in frames[1:]:
        out = out.unionByName(f._df, allowMissingColumns=True)
    return BodoDataFrame(out)


def merge(left: BodoDataFrame, right: BodoDataFrame, **kw) -> BodoDataFrame:
    """Module-level pd.merge (reference base.py merge)."""
    return left.merge(right, **kw)


def read_iceberg(table: str, **kw) -> BodoDataFrame:
    """reference base.py read_iceberg -> sources.io (clean error offline)."""
    from .sources.io import read_iceberg as _ri
    return BodoDataFrame(_ri(table, **kw))


def read_iceberg_table(table, **kw) -> BodoDataFrame:
    """reference base.py:364 read_iceberg_table(PyIcebergTable) ->
    sources.io routing by dotted identifier."""
    from .sources.io import read_iceberg_table as _rit
    return BodoDataFrame(_rit(table, **kw))


def to_datetime(s: "BodoSeries", format: str | None = None) -> "BodoSeries":
    """pd.to_datetime over a Series (reference base.py to_datetime);
    strftime tokens map to the Java pattern."""
    if format is None:
        col = F.to_timestamp(s._col)
    else:
        java = (format.replace("%Y", "yyyy").replace("%m", "MM")
                .replace("%d", "dd").replace("%H", "HH")
                .replace("%M", "mm").replace("%S", "ss"))
        col = F.to_timestamp(s._col, java)
    return BodoSeries(s._frame, col, s.name)


_TD_SECS = {"s": 1.0, "sec": 1.0, "seconds": 1.0, "m": 60.0, "min": 60.0,
            "minutes": 60.0, "h": 3600.0, "hours": 3600.0, "d": 86400.0,
            "days": 86400.0, "ms": 1e-3, "us": 1e-6}


def to_timedelta(s: "BodoSeries", unit: str = "s") -> "BodoSeries":
    """pd.to_timedelta (reference docs general_functions/to_timedelta.md)
    as a day-time INTERVAL column -- adds directly to timestamps."""
    if unit not in _TD_SECS:
        raise ValueError(f"unsupported unit {unit!r}")
    col = F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0),
        s._col.cast("double") * _TD_SECS[unit])
    return BodoSeries(s._frame, col, s.name)


def timedelta_range(start: int = 0, periods: int = 10, freq: str = "d",
                    spark=None) -> BodoDataFrame:
    """pd.timedelta_range as a distributed interval spine."""
    from .session import get_spark as _gs
    spark = spark or _gs()
    step = _TD_SECS[freq]
    df = spark.range(periods).select(
        F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                           (F.col("id") + start) * step).alias("td"))
    return BodoDataFrame(df)


def merge_asof(left: BodoDataFrame, right: BodoDataFrame, **kw) -> BodoDataFrame:
    from .operators.asof import merge_asof as _ma
    return BodoDataFrame(_ma(left._df, right._df, **kw))


def _bin_code(col: Column, edges: list[float],
              include_lowest: bool) -> Column:
    """Bin index (0-based) of col within explicit edges, pandas ``cut``
    membership: right-closed intervals (lo, hi]; the first interval is
    [lo, hi] when include_lowest. NULL outside the range. A literal CASE
    chain -- pure codegen expression, no shuffle, no UDF."""
    code = F.lit(None).cast("int")
    for i in reversed(range(len(edges) - 1)):
        lo_ok = (col >= edges[0]) if (i == 0 and include_lowest) \
            else (col > edges[i])
        code = F.when(lo_ok & (col <= edges[i + 1]), F.lit(i)).otherwise(code)
    return code


def cut(s: BodoSeries, bins, labels=None, right: bool = True,
        include_lowest: bool = False) -> BodoSeries:
    """pd.cut (reference docs api_docs/pandas/general_functions/cut.md).

    ``bins`` is an explicit edge list, or an int for equal-width bins --
    the int form needs the global min/max, one scalar-reduction job
    (same contract as len()); assignment itself is a broadcast-free CASE
    expression. labels=False yields integer codes; labels=None yields
    pandas-style "(a, b]" strings.
    """
    if right is not True:
        raise NotImplementedError("cut(right=False) not supported")
    if isinstance(bins, int):
        row = s._frame._df.select(
            F.min(s._col).cast("double").alias("lo"),
            F.max(s._col).cast("double").alias("hi")).collect()[0]
        lo, hi = float(row["lo"]), float(row["hi"])
        # pandas pads the range by 0.1% and includes the lowest value
        pad = (hi - lo) * 0.001 if hi > lo else 0.001
        edges = [lo - pad] + [lo + (hi - lo) * (i + 1) / bins
                              for i in range(bins)]
        include_lowest = True
    else:
        edges = [float(b) for b in bins]
    code = _bin_code(s._col, edges, include_lowest)
    return _bin_result(s, code, edges, labels)


def _bin_result(s: BodoSeries, code: Column, edges: list[float],
                labels) -> BodoSeries:
    """Shared cut/qcut output shaping: False = integer codes, a list =
    the caller's labels, None = pandas-style '(a, b]' strings."""
    if labels is False:
        return BodoSeries(s._frame, code, s.name)
    if isinstance(labels, (list, tuple)):
        if len(labels) != len(edges) - 1:
            raise ValueError("labels length must equal number of bins")
        texts = [str(v) for v in labels]
    else:
        texts = [f"({edges[i]}, {edges[i + 1]}]"
                 for i in range(len(edges) - 1)]
    lab = F.lit(None).cast("string")
    for i in reversed(range(len(edges) - 1)):
        lab = F.when(code == i, F.lit(texts[i])).otherwise(lab)
    return BodoSeries(s._frame, lab, s.name)


def qcut(s: BodoSeries, q, labels=None) -> BodoSeries:
    """pd.qcut (reference general_functions/qcut.md): quantile-based cut.

    Edges come from Spark's exact ``percentile`` (linear interpolation,
    the same estimator pandas uses) -- one aggregate job collecting
    q+1 scalars; the assignment is the same CASE expression as cut().
    """
    probs = ([i / q for i in range(q + 1)] if isinstance(q, int)
             else [float(p) for p in q])
    arr = "array({})".format(",".join(f"{p!r}D" for p in probs))
    row = (s._frame._df.select(s._col.alias("_qcut_x"))
           .select(F.expr(f"percentile(_qcut_x, {arr})").alias("e"))
           .collect())
    edges = [float(e) for e in row[0]["e"]]
    code = _bin_code(s._col, edges, include_lowest=True)
    return _bin_result(s, code, edges, labels)


def crosstab(index: BodoSeries, columns: BodoSeries) -> BodoDataFrame:
    """pd.crosstab over two Series of the SAME frame (reference
    general_functions/crosstab.md): groupBy(index).pivot(columns).count()
    -- one shuffle; the pivoted column set is discovered by Spark's
    pivot (distinct scan), exactly pandas' column discovery."""
    if index._frame is not columns._frame:
        raise ValueError("crosstab Series must share a parent frame")
    df = index._frame._df.select(index._col.alias(index.name or "index"),
                                 columns._col.alias(columns.name or "col"))
    out = (df.groupBy(index.name or "index")
           .pivot(columns.name or "col")
           .count().na.fill(0)
           .orderBy(index.name or "index"))
    return BodoDataFrame(out)


def get_dummies(s: BodoSeries, prefix: str | None = None,
                prefix_sep: str = "_") -> BodoDataFrame:
    """pd.get_dummies (reference general_functions/get_dummies.md):
    one-hot indicator columns. The distinct value set is collected
    (sorted) to name the columns -- the same driver-side discovery
    pandas/pivot do; the indicators themselves are pure expressions."""
    vals = sorted(r["v"] for r in
                  s._frame._df.select(s._col.alias("v"))
                  .where(s._col.isNotNull()).distinct().collect())
    pre = f"{prefix}{prefix_sep}" if prefix else ""
    cols = [F.when(s._col == v, F.lit(1)).otherwise(F.lit(0))
            .alias(f"{pre}{v}") for v in vals]
    return BodoDataFrame(s._frame._df.select(*cols))


def to_numeric(s: BodoSeries, errors: str = "raise",
               downcast: str | None = None) -> BodoSeries:
    """pd.to_numeric (reference general_functions/to_numeric.md):
    errors='coerce' is try_cast (NULL on garbage); 'raise' raises on the
    first unparseable value at execution time (the session runs with
    ANSI off, so a plain cast would silently NULL -- guard explicitly).
    downcast='integer' downcasts to bigint ONLY when every parsed value
    is losslessly integral (pandas semantics: '2.5' stays 2.5 as float,
    it is never coerced to NULL/int) -- that whole-column decision costs
    one scan, same contract as pandas' post-parse downcast."""
    tried = s._col.try_cast("double")
    target = "double"
    if downcast == "integer":
        nonint = (s._frame._df.select(tried.alias("v"))
                  .where(F.col("v").isNotNull()
                         & ((F.floor("v") != F.col("v"))
                            | (F.abs("v") > F.lit(2.0 ** 62))))
                  .limit(1).count())
        if nonint == 0:
            target = "bigint"
            tried = tried.cast("bigint")
    if errors == "coerce":
        return BodoSeries(s._frame, tried, s.name)
    col = F.when(
        s._col.isNotNull() & s._col.try_cast("double").isNull(),
        F.raise_error(F.concat(F.lit("to_numeric: unparseable value "),
                               s._col.cast("string")))
        .cast(target)).otherwise(tried)
    return BodoSeries(s._frame, col, s.name)


def unique(s: BodoSeries) -> list:
    """pd.unique: distinct values (no order guarantee, like the
    distributed reference; collect is the terminal step by contract)."""
    return [r["v"] for r in
            s._frame._df.select(s._col.alias("v")).distinct().collect()]


def date_range(start: str, end: str | None = None,
               periods: int | None = None, freq: str = "D",
               spark=None) -> BodoDataFrame:
    """pd.date_range (reference general_functions/date_range.md) as a
    DISTRIBUTED frame: spark.range(n) + timestamp arithmetic, so a
    billion-row calendar spine never materializes on the driver."""
    import datetime as _dt

    from .session import get_spark as _gs
    spark = spark or _gs()
    unit_secs = {"D": 86400, "H": 3600, "h": 3600, "T": 60, "min": 60,
                 "S": 1, "s": 1, "W": 7 * 86400}
    if freq not in unit_secs:
        raise NotImplementedError(f"freq {freq!r} not supported")
    step = unit_secs[freq]
    t0 = _dt.datetime.fromisoformat(start)
    if freq == "W":
        # pandas 'W' == 'W-SUN': the spine starts at the first Sunday
        # on/after start (Monday=0 .. Sunday=6)
        t0 += _dt.timedelta(days=(6 - t0.weekday()) % 7)
    if periods is None:
        if end is None:
            raise ValueError("date_range needs end or periods")
        t1 = _dt.datetime.fromisoformat(end)
        periods = int((t1 - t0).total_seconds() // step) + 1
    start_epoch = int(t0.replace(tzinfo=_dt.timezone.utc).timestamp())
    df = (spark.range(periods)
          .select(F.timestamp_seconds(
              F.lit(start_epoch) + F.col("id") * step).alias("ts")))
    return BodoDataFrame(df)


def _dtype_to_spark(dtype) -> str:
    m = {"int64": "bigint", "int32": "int", "float64": "double",
         "float32": "float", "str": "string", "string": "string",
         "bool": "boolean", "datetime64[ns]": "timestamp",
         int: "bigint", float: "double", str: "string", bool: "boolean"}
    return m.get(dtype, str(dtype))
