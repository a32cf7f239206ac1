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


# ---------------------------------------------------------------- SCD2

def _scd2_frames(spark):
    dim = spark.createDataFrame(
        [(1, "a", "2019-01-01", "2020-01-01", False),   # history
         (1, "b", "2020-01-01", None, True),
         (2, "x", "2020-01-01", None, True),
         (3, "y", "2020-01-01", None, True)],
        "k bigint, seg string, eff_from string, eff_to string, "
        "is_current boolean")
    changes = spark.createDataFrame(
        [(1, "b2", "U"),    # tracked change -> close + new version
         (2, "x", "U"),     # identical -> no-op
         (3, "y", "D"),     # soft delete -> close only
         (9, "new", "U")],  # brand-new key -> insert
        "k bigint, seg string, action string")
    return dim, changes


def test_scd2_close_insert_delete_noop(spark):
    from bodo_spark.operators.merge import scd2_apply
    dim, changes = _scd2_frames(spark)
    out = scd2_apply(dim, changes, key=["k"], tracked=["seg"],
                     batch_ts="2024-06-01",
                     when_deleted=F.col("src_action") == "D").collect()
    rows = {(r.k, r.seg, r.eff_from): (r.eff_to, r.is_current)
            for r in out}
    assert len(out) == len(rows) == 6
    # history untouched
    assert rows[(1, "a", "2019-01-01")] == ("2020-01-01", False)
    # changed key: old closed at batch_ts, new open version
    assert rows[(1, "b", "2020-01-01")] == ("2024-06-01", False)
    assert rows[(1, "b2", "2024-06-01")] == (None, True)
    # no-op key passes through open
    assert rows[(2, "x", "2020-01-01")] == (None, True)
    # soft delete: closed, NO new version
    assert rows[(3, "y", "2020-01-01")] == ("2024-06-01", False)
    assert not any(k == 3 and cur for (k, _, _), (_, cur) in rows.items())
    # insert
    assert rows[(9, "new", "2024-06-01")] == (None, True)


def test_scd2_null_safe_tracking_and_extra_cols(spark):
    from bodo_spark.operators.merge import scd2_apply
    dim = spark.createDataFrame(
        [(1, None, "m", "2020-01-01", None, True)],
        "k bigint, seg string, extra string, eff_from string, "
        "eff_to string, is_current boolean")
    same = spark.createDataFrame([(1, None)], "k bigint, seg string")
    out = scd2_apply(dim, same, key=["k"], tracked=["seg"],
                     batch_ts="2024-06-01").collect()
    assert len(out) == 1 and out[0].is_current  # NULL == NULL: no-op
    diff = spark.createDataFrame([(1, "s")], "k bigint, seg string")
    out = {(r.seg, r.is_current): r
           for r in scd2_apply(dim, diff, key=["k"], tracked=["seg"],
                               batch_ts="2024-06-01").collect()}
    assert out[(None, False)].eff_to == "2024-06-01"
    assert out[("s", True)].extra is None  # untracked extras null on new


def test_scd2_missing_columns_raises(spark):
    from bodo_spark.operators.merge import scd2_apply
    dim = spark.createDataFrame([(1, "a")], "k bigint, seg string")
    with pytest.raises(ValueError, match="SCD columns"):
        scd2_apply(dim, dim, key=["k"], tracked=["seg"],
                   batch_ts="2024-06-01")


def test_merge_insert_condition(spark):
    from bodo_spark.operators.merge import merge_into
    t = spark.createDataFrame([(1, 10.0)], "k long, v double")
    s = spark.createDataFrame([(1, 1.0, "U"), (2, 2.0, "U"),
                               (3, 3.0, "D"), (4, 4.0, None)],
                              "k long, v double, op string")
    out = merge_into(
        t, s, on=["k"],
        when_matched_update={"v": F.col("src_v")},
        when_not_matched_insert={"k": F.col("src_k"),
                                 "v": F.col("src_v")},
        when_not_matched_insert_condition=F.col("src_op") != "D")
    got = {r.k: r.v for r in out.collect()}
    # k=3 ('D', unmatched) skipped; k=4 (NULL condition -> 3VL no) too
    assert got == {1: 1.0, 2: 2.0}
