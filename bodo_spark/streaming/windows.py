"""Streaming building blocks: sources, windowed aggs, stateful sessions."""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_stream_parquet(spark: SparkSession, path: str,
                        schema: T.StructType,
                        max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a parquet directory (micro-batch per
    file; at scale: one directory partition per hour/day)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def read_stream_csv(spark: SparkSession, path: str, schema: T.StructType,
                    header: bool = True,
                    max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over CSV files."""
    return (spark.readStream.schema(schema)
            .option("header", str(header).lower())
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .csv(path))


def read_stream_json(spark: SparkSession, path: str, schema: T.StructType,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over JSON-lines files."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(path))


def read_stream_rate(spark: SparkSession,
                     rows_per_second: int = 100) -> DataFrame:
    """Synthetic (timestamp, value) source -- load/latency testing."""
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with zone); parquet written with
    TIMESTAMP_NTZ arrives as ntz, which Spark rejects as event time.
    Reinterpret the wall-clock as session-zone instants (the session
    pins UTC -- session.py -- so this is lossless and deterministic)."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def _window_aggs(df: DataFrame, value_col: str | None) -> list:
    """count(*) plus sum(value_col) when the column exists/was asked for.
    value_col='value' is a default-on convenience (the events table shape),
    silently skipped when absent so the helpers stay generic over schemas."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None and value_col in df.columns:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return aggs


def tumbling_agg(df: DataFrame, ts_col: str, window: str,
                 group_cols: Iterable[str] = (),
                 watermark: str = "10 minutes",
                 value_col: str | None = "value") -> DataFrame:
    """Watermarked tumbling-window counts/sums; late rows beyond the
    watermark are dropped, state is bounded."""
    df = _event_time(df, ts_col)
    aggs = _window_aggs(df, value_col)
    return (df.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("win"),
                     *group_cols)
            .agg(*aggs)
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    *group_cols,
                    "n", *([f"sum_{value_col}"] if len(aggs) > 1 else [])))


def sliding_agg(df: DataFrame, ts_col: str, window: str, slide: str,
                group_cols: Iterable[str] = (),
                watermark: str = "10 minutes",
                value_col: str | None = "value") -> DataFrame:
    df = _event_time(df, ts_col)
    aggs = _window_aggs(df, value_col)
    return (df.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window, slide).alias("win"),
                     *group_cols)
            .agg(*aggs)
            .select(F.col("win.start").alias("win_start"), *group_cols,
                    "n", *([f"sum_{value_col}"] if len(aggs) > 1 else [])))


def sessionize_stateful(df: DataFrame, ts_col: str, key_col: str,
                        gap: str = "30 minutes",
                        watermark: str = "10 minutes") -> DataFrame:
    """Session windows via the built-in session_window (Spark's native
    stateful operator; custom state logic would use
    applyInPandasWithState with the same shape)."""
    df = _event_time(df, ts_col)
    return (df.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(ts_col, gap).alias("win"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("sess_start"),
                    F.col(key_col), "n_events"))


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (Trigger.AvailableNow) into an in-memory sink and return the result
    as a batch DataFrame -- deterministic, test-friendly.

    ``output_mode``: "complete" for aggregations (the sink holds the
    final table); "append" for non-aggregating plans like stream-stream
    joins (the sink accumulates every emitted row)."""
    spark = stream_df.sparkSession
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
