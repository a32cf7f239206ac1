"""MERGE INTO operator semantics (update / delete / insert clauses) and
the parquet copy-on-write path."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bodo_spark.operators.merge import merge_into, merge_into_parquet


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4],
                      "v": [10.0, 20.0, 30.0, 40.0],
                      "tag": ["a", "b", "c", "d"]}))


@pytest.fixture
def source(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": [2, 3, 9], "delta": [5.0, 100.0, 7.0]}))


def _rows(df):
    return {r["k"]: (r["v"], r["tag"]) for r in df.collect()}


def test_update_only(target, source):
    out = merge_into(target, source, on=["k"],
                     when_matched_update={"v": F.col("v") + F.col("src_delta")})
    got = _rows(out)
    assert got == {1: (10.0, "a"), 2: (25.0, "b"), 3: (130.0, "c"),
                   4: (40.0, "d")}  # k=9 unmatched source dropped


def test_update_delete_insert(target, source):
    out = merge_into(
        target, source, on=["k"],
        when_matched_update={"v": F.col("v") + F.col("src_delta")},
        when_matched_delete=F.col("src_delta") > 50,
        when_not_matched_insert={"k": F.col("src_k"),
                                 "v": F.col("src_delta"),
                                 "tag": F.lit("new")})
    got = _rows(out)
    # k=3 deleted (delta 100 > 50); k=9 inserted; k=1,4 untouched
    assert got == {1: (10.0, "a"), 2: (25.0, "b"), 4: (40.0, "d"),
                   9: (7.0, "new")}


def test_insert_fills_missing_cols_with_typed_nulls(target, source):
    out = merge_into(target, source, on=["k"],
                     when_not_matched_insert={"k": F.col("src_k"),
                                              "v": F.col("src_delta")})
    row = [r for r in out.collect() if r["k"] == 9][0]
    assert row["v"] == 7.0 and row["tag"] is None
    assert dict(out.dtypes)["tag"] == "string"


def test_null_delete_condition_keeps_row(spark, target):
    """ANSI 3VL: a delete condition evaluating to NULL is not-TRUE, so the
    matched row must be KEPT (and still updated), not dropped."""
    src = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3], "delta": [5.0, None]}))
    out = merge_into(
        target, src, on=["k"],
        when_matched_update={"v": F.coalesce(F.col("src_delta"), F.lit(0.0))},
        when_matched_delete=F.col("src_delta") > 50)  # NULL for k=3
    got = _rows(out)
    assert got == {1: (10.0, "a"), 2: (5.0, "b"), 3: (0.0, "c"),
                   4: (40.0, "d")}


def test_merge_into_parquet_cow(spark, target, source, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merge") / "t")
    target.write.parquet(path)
    merge_into_parquet(
        spark, path, source, on=["k"],
        when_matched_update={"v": F.col("v") + F.col("src_delta")},
        when_not_matched_insert={"k": F.col("src_k"),
                                 "v": F.col("src_delta"),
                                 "tag": F.lit("new")})
    back = _rows(spark.read.parquet(path))
    assert back == {1: (10.0, "a"), 2: (25.0, "b"), 3: (130.0, "c"),
                    4: (40.0, "d"), 9: (7.0, "new")}
