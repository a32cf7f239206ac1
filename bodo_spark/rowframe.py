"""Driver-local tiny-frame constructor without the fan-out.

``SparkSession.createDataFrame(list_of_rows)`` parallelizes the rows
across ``defaultParallelism`` partitions -- on local[32] a 4-row result
frame becomes a 32-task PythonRDD whose FIRST evaluation spawns up to
32 Python worker processes behind one global lock (SparkEnv.
createPythonWorker is synchronized; measured ~0.5 s per spawn, ~16 s
serialized for a single tiny frame). Every bounded driver-side artifact
here (collected gate results, meta one-rowers, centroid/codebook seed
tables, lookup key frames) is a handful of rows, so they all go through
ONE partition instead: one task, one Python worker, identical row
values -- the pickle/verify conversion path is byte-for-byte the same
as the stock ``createDataFrame``; only the slice count changes.

This is the guide's "the driver should do almost no data work" rule
applied to the return leg: a driver-local result must not fan out into
a cluster-wide empty-task storm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` pinned to ONE partition.

    ``rows``: a list of tuples/Rows (NOT a pandas frame -- those take
    the Arrow fast path already). ``schema``: DDL string or StructType,
    required (these frames carry exact driver-computed values; inference
    has no place here)."""
    rows = list(rows)
    if not rows:
        # createDataFrame on an empty RDD needs the schema anyway; the
        # plain list form builds the empty relation without a job.
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema)
