"""rowframe.local_df: the driver-local tiny-frame constructor must be
value-identical to stock createDataFrame while occupying exactly ONE
partition (the r14 fan-out fix: a 4-row result frame must not become a
defaultParallelism-wide PythonRDD whose first evaluation spawns a
Python worker per core). Also pins the r14 local-FS posture: the
no-fork chmod FS is active and hive-partitioned writes still come out
0755 / readable."""

from __future__ import annotations

import os
import stat

from pyspark.sql import functions as F

from bodo_spark.rowframe import local_df


def test_local_df_values_and_no_python_fanout(spark):
    rows = [(1, "a", [1.0, 2.0]), (2, None, []), (3, "c", None)]
    schema = "k long, s string, v array<double>"
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the fan-out fix: never wider than the row count (a 3-row frame
    # must not become a defaultParallelism-wide RDD), and on the arrow
    # fast path evaluation is a pure-JVM LocalTableScan -- no
    # Python-worker round-trip per action
    assert got.rdd.getNumPartitions() <= len(rows)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "BatchEvalPython" not in plan and "ExistingRDD" not in plan


def test_local_df_empty(spark):
    got = local_df(spark, [], "k long, s string")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "s"]


def test_local_df_struct_type_schema(spark):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("w", T.DoubleType())])
    got = local_df(spark, [(5, 0.5)], schema)
    assert [tuple(r) for r in got.collect()] == [(5, 0.5)]
    assert got.rdd.getNumPartitions() == 1


def test_local_df_arrow_pickle_parity(spark):
    """The arrow fast path must be value- and schema-identical to the
    stock pickle conversion across the type battery local_df callers
    use (numerics, strings, bools, binary, dates, nested arrays,
    structs, NULLs everywhere)."""
    import datetime

    rows = [
        (1, 2.5, float("nan"), "s", True, b"\x00\xff",
         datetime.date(2021, 2, 3), [[1.0, -2.0], []], {"x": 7}),
        (None, None, None, None, None, None, None, None, None),
    ]
    ddl = ("k long, d double, nn double, s string, b boolean, "
           "bin binary, dt date, vv array<array<double>>, "
           "st struct<x: long>")
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(repr, got.collect())) == \
        sorted(map(repr, want.collect()))


def test_local_df_unsafe_types_fall_back(spark):
    """Timestamps/decimals stay on the pickle path (session-timezone /
    scale semantics), still one partition, values identical to stock."""
    import datetime
    from decimal import Decimal

    rows = [(datetime.datetime(2020, 5, 1, 12, 30), Decimal("1.25")),
            (None, None)]
    ddl = "ts timestamp, d decimal(10,2)"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.rdd.getNumPartitions() == 1
    assert got.schema == want.schema
    assert sorted(map(repr, got.collect())) == \
        sorted(map(repr, want.collect()))


def test_fast_local_fs_partitioned_write_roundtrip(spark, tmp_path):
    # the no-fork chmod FS must be wired for local masters, and a
    # hive-partitioned write through it must produce the same 0755
    # directories + readable files the stock path produced
    assert spark.conf.get("spark.hadoop.fs.file.impl",
                          "") == "bodospark.fs.FastLocalFileSystem"
    path = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p"))
    df.repartition(F.col("p")).write.partitionBy("p").parquet(path)
    pdirs = [d for d in os.listdir(path) if d.startswith("p=")]
    assert len(pdirs) == 4
    mode = stat.S_IMODE(os.stat(os.path.join(path, pdirs[0])).st_mode)
    assert mode == 0o755
    assert spark.read.parquet(path).count() == 20


def test_artifact_df_matches_spark_read(spark, tmp_path):
    """read_artifact_rows/artifact_df replace spark.read.parquet on
    bounded store artifacts (meta one-rowers, centroid tables): same
    rows, same schema as the Spark read of the same directory."""
    from bodo_spark.rowframe import artifact_df, read_artifact_rows
    path = str(tmp_path / "art")
    src = spark.createDataFrame(
        [(0, [1.0, 2.5], "a", 3), (1, [0.0], None, -7)],
        "cid bigint, vec array<double>, s string, n int")
    src.coalesce(1).write.parquet(path)
    want = spark.read.parquet(path)
    got = artifact_df(spark, path)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    rows, schema = read_artifact_rows(path)
    assert {r["cid"] for r in rows} == {0, 1}
    assert rows[0]["vec"] == [1.0, 2.5] or rows[1]["vec"] == [1.0, 2.5]


def test_artifact_df_nested_codebooks(spark, tmp_path):
    """The PQ meta artifact carries array<array<array<double>>>; the
    driver-local read must round-trip it exactly."""
    from bodo_spark.rowframe import read_artifact_rows
    path = str(tmp_path / "meta")
    cbs = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
    spark.createDataFrame(
        [(cbs, 16, "vec_id")],
        "codebooks array<array<array<double>>>, coarse_dim int, "
        "id_col string").coalesce(1).write.parquet(path)
    rows, _ = read_artifact_rows(path)
    m = rows[0]
    assert [[list(cw) for cw in book] for book in m["codebooks"]] == cbs
    assert int(m["coarse_dim"]) == 16 and m["id_col"] == "vec_id"


def test_write_artifact_rows_matches_spark_write(spark, tmp_path):
    """write_artifact_rows replaces df.write.parquet on bounded store
    artifacts: a Spark read of the pyarrow-written directory must see
    the same schema and rows as a Spark read of the Spark-written twin
    (incl. the nested codebook type), and mode semantics must mirror
    the DataFrameWriter contract."""
    import pytest

    from bodo_spark.rowframe import read_artifact_rows, write_artifact_rows
    ddl = ("los array<double>, his array<double>, bits int, "
           "codebooks array<array<array<double>>>, id_col string")
    row = ([1.0, -2.5], [3.5, 9.0], 8, [[[1.0, 2.0], [3.0, 4.0]]],
           "vec_id")
    p_spark = str(tmp_path / "spark")
    p_arrow = str(tmp_path / "arrow")
    spark.createDataFrame([row], ddl).coalesce(1).write.parquet(p_spark)
    write_artifact_rows(p_arrow, [row], ddl)
    want = spark.read.parquet(p_spark)
    got = spark.read.parquet(p_arrow)
    assert got.schema == want.schema
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    rows, schema = read_artifact_rows(p_arrow)
    assert schema == want.schema
    assert rows[0]["bits"] == 8 and rows[0]["los"] == [1.0, -2.5]
    # mode contract
    with pytest.raises(FileExistsError):
        write_artifact_rows(p_arrow, [row], ddl)
    write_artifact_rows(p_arrow, [row], ddl, mode="overwrite")
    assert spark.read.parquet(p_arrow).count() == 1
