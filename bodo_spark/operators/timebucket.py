"""Hypertable-style time bucketing with gap filling.

The task brief's example of an operator Spark lacks natively: bucket a
timestamp column to fixed intervals, aggregate per (group, bucket), and
materialize EMPTY buckets (null aggregates) so downstream
interpolation / charting sees a dense time axis.

Scale design: the per-group dense bucket axis is generated with
sequence()+explode from each group's own [min, max] bucket range -- no
driver-side loop, no cross join against a global calendar (which would
explode with group count x global range). The range aggregate re-reads
the already-aggregated (group, bucket) frame, NOT the raw fact table,
so the raw data is scanned exactly once; the gap-fill join runs over
bucket-cardinality inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column, seconds: int) -> Column:
    """Floor a timestamp to a fixed ``seconds`` grid (epoch-aligned)."""
    return F.timestamp_seconds(
        (F.unix_timestamp(ts) / seconds).cast("bigint") * seconds)


def interpolate_linear(df: DataFrame, *, group_cols: list[str],
                       order_col: str, value_col: str,
                       out_col: str | None = None,
                       ndigits: int = 6) -> DataFrame:
    """Linear interpolation of NULL values over an ordered series (the
    TimescaleDB ``interpolate()`` / pandas ``interpolate('linear')``
    companion to bucket_gapfill): each NULL between two non-null
    neighbors becomes prev + (next - prev) * (pos - prev_pos) /
    (next_pos - prev_pos), rounded to ``ndigits``; leading/trailing
    NULLs (no neighbor on one side) stay NULL. ``order_col`` must be
    numeric (epoch seconds for time series -- bucket_gapfill's grid).

    Plan: four window expressions over ONE per-group ordered frame
    (prev/next value and position via ignorenulls last/first) -- a
    single shuffle on the group key, no self-joins, no Python. At
    100 TB of (group, bucket) rollups each group's series sorts
    within its partition; groups are independent."""
    from pyspark.sql import Window as Wnd
    out_col = out_col or value_col
    g = [F.col(c) for c in group_cols]
    o, v = F.col(order_col), F.col(value_col)
    wp = (Wnd.partitionBy(*g).orderBy(order_col)
          .rowsBetween(Wnd.unboundedPreceding, -1))
    wn = (Wnd.partitionBy(*g).orderBy(order_col)
          .rowsBetween(1, Wnd.unboundedFollowing))
    pv = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(wp)
    po = F.last(F.when(v.isNotNull(), o), ignorenulls=True).over(wp)
    nv = F.first(F.when(v.isNotNull(), v), ignorenulls=True).over(wn)
    no = F.first(F.when(v.isNotNull(), o), ignorenulls=True).over(wn)
    frac = (o - po).cast("double") / (no - po)
    # scaled integer rounding, NOT F.round(x, n): Spark rounds via the
    # double's exact decimal expansion while DuckDB rounds the SCALED
    # double -- a value whose binary form reads ...4999 decimal but
    # scales to an exact .5 flips between them (caught by the sf0.001
    # oracle run). round(x*10^n, 0)/10^n makes both engines round the
    # IDENTICAL scaled double, and both break .5 ties away from zero.
    scale = F.lit(float(10 ** ndigits))
    interp = F.round((pv + (nv - pv) * frac) * scale, 0) / scale
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(pv.isNotNull() & nv.isNotNull(), interp))
    return df.withColumn(out_col, filled)


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel analysis: per user, how far through the ``steps``
    sequence did their event history progress? Returns ``(user_col,
    stage)`` with stage in 0..len(steps): stage ``i`` means the first
    ``i`` steps occurred in order (each step strictly after the
    previous one in (ts, event id) order -- the id tiebreak makes
    same-timestamp events deterministic). The classic conversion
    funnel (view -> click -> purchase); Spark has no MATCH_RECOGNIZE,
    so this is the composition that covers its most common use.

    Only users with at least one step-typed event appear (the frame is
    pruned to step types BEFORE the shuffle -- at 100 TB of events the
    groupBy moves only funnel-relevant rows).

    Plan: ONE groupBy(user): collect the (ts, id, type) structs,
    array_sort (struct order = field order), and advance a stage
    counter with a fold expression -- zero Python, no window, no self
    join per step. Per-user state is that user's step-typed events
    only; the fold uses F.get (NULL past the end), so it is ANSI-safe.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = (events.where(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col),
                  F.struct(F.col(ts_col).alias("t"),
                           F.col(id_col).alias("i"),
                           F.col(type_col).alias("e")).alias("_ev")))
    arr = F.array_sort(F.collect_list("_ev"))
    stage = F.aggregate(
        arr, F.lit(0),
        lambda acc, e: F.when(e["e"] == F.get(steps_arr, acc), acc + 1)
        .otherwise(acc))
    return (ev.groupBy(user_col)
            .agg(stage.cast("bigint").alias("stage")))


def bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    seconds: int,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Aggregate per (group, bucket) and fill missing buckets with null
    aggregate values. ``aggs`` maps output name -> aggregate Column."""
    b = time_bucket(F.col(ts_col), seconds).alias("bucket")
    agged = (df.groupBy(*group_cols, b)
             .agg(*[c.alias(n) for n, c in aggs.items()]))
    spine = (agged.groupBy(*group_cols)
             .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
             .select(*group_cols,
                     F.explode(F.sequence(
                         "_lo", "_hi",
                         F.expr(f"INTERVAL {seconds} SECOND")))
                     .alias("bucket")))
    return spine.join(agged, [*group_cols, "bucket"], "left")
