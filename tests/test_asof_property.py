"""Property-based differential test: operators.asof.merge_asof vs
pandas.merge_asof on randomized frames (SURVEY.md section 5 notes the
reference has no property tests -- this goes beyond it for the one
operator Spark lacks natively)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bodo_spark.operators.asof import merge_asof


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = st.integers(0, 2)
    times = st.integers(0, 30)
    left = pd.DataFrame({
        "k": [draw(keys) for _ in range(n_left)],
        "t": [draw(times) for _ in range(n_left)],
        "lv": list(range(n_left)),
    })
    right = pd.DataFrame({
        "k": [draw(keys) for _ in range(n_right)],
        "t": [draw(times) for _ in range(n_right)],
        "rv": [i * 10 for i in range(n_right)],
    })
    # unique (k, t) on the right so the as-of match is well-defined;
    # empty frames otherwise default to float64 and break the pandas merge
    right = (right.drop_duplicates(["k", "t"]).reset_index(drop=True)
             .astype({"k": "int64", "t": "int64", "rv": "int64"}))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    exact = draw(st.booleans())
    return left, right, direction, exact


@given(asof_case())
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_merge_asof_matches_pandas(spark, case):
    left, right, direction, exact = case
    got = merge_asof(
        spark.createDataFrame(left),
        spark.createDataFrame(right) if len(right) else
        spark.createDataFrame([], "k long, t long, rv long"),
        on="t", by="k", direction=direction, allow_exact_matches=exact,
    ).toPandas().sort_values("lv").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t", by="k", direction=direction, allow_exact_matches=exact,
    ).sort_values("lv").reset_index(drop=True)

    assert len(got) == len(exp)
    for col in ("k", "t", "lv", "rv"):
        g = got[col].tolist()
        e = exp[col].tolist()
        for a, b in zip(g, e):
            if pd.isna(a) and pd.isna(b):
                continue
            assert a == b, (col, got.to_dict(), exp.to_dict())


def test_merge_asof_tolerance(spark):
    from pyspark.sql import functions as F
    left = pd.DataFrame({"k": [1, 1, 1], "t": [5, 10, 20], "lv": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 1], "t": [4, 9], "rv": [100, 200]})
    got = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by="k", direction="backward", tolerance=F.lit(2),
    ).toPandas().sort_values("lv")
    exp = pd.merge_asof(left, right, on="t", by="k",
                        direction="backward", tolerance=2).sort_values("lv")
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()
