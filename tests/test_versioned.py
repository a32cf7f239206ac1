"""Versioned parquet tables: snapshot log, time travel, COW merge."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bodo_spark.sources.versioned import (merge_versioned, read_versioned,
                                          snapshots, write_versioned)


@pytest.fixture()
def table(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("vtab") / "t")


def test_append_overwrite_time_travel(spark, table):
    df1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    df2 = spark.createDataFrame(pd.DataFrame({"k": [3], "v": [30]}))
    s1 = write_versioned(df1, table, mode="append")
    s2 = write_versioned(df2, table, mode="append")
    assert [s.snapshot_id for s in snapshots(table)] == [1, 2]
    assert read_versioned(spark, table).count() == 3
    assert read_versioned(spark, table, snapshot_id=s1.snapshot_id).count() == 2
    # as-of: anything at/after s2's commit sees 3 rows
    assert read_versioned(spark, table, as_of_ms=s2.timestamp_ms).count() == 3
    df3 = spark.createDataFrame(pd.DataFrame({"k": [9], "v": [90]}))
    write_versioned(df3, table, mode="overwrite")
    assert read_versioned(spark, table).count() == 1
    # history intact after overwrite
    assert read_versioned(spark, table, snapshot_id=2).count() == 3


def test_merge_versioned_cow(spark, table):
    t = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}))
    write_versioned(t, table)
    src = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "delta": [5.0, 40.0]}))
    merge_versioned(
        spark, table, src, on=["k"],
        when_matched_update={"v": F.col("v") + F.col("src_delta")},
        when_not_matched_insert={"k": F.col("src_k"),
                                 "v": F.col("src_delta")})
    got = {r.k: r.v for r in read_versioned(spark, table).collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 30.0, 4: 40.0}
    # the pre-merge state is still one snapshot back
    prev = {r.k: r.v for r in
            read_versioned(spark, table, snapshot_id=1).collect()}
    assert prev == {1: 10.0, 2: 20.0, 3: 30.0}


def test_commit_race_is_serialized(spark, table):
    import threading
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1]}))
    write_versioned(df, table)
    errs, ids = [], []

    def committer():
        try:
            ids.append(write_versioned(df, table, "append").snapshot_id)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=committer) for _ in range(4)]
    [t.start() for t in ts]; [t.join() for t in ts]
    assert not errs
    assert sorted(ids) == [2, 3, 4, 5]  # each commit got a unique id
