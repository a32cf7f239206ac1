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
