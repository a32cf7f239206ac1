"""Skew-mitigation operators (operators/skew.py): two-stage distinct
aggregation semantics and salted_join's error contract. (salted_join's
result-equivalence is covered in test_io.py::test_salted_join_equals_
plain_join.)"""

from __future__ import annotations

import pandas as pd
import pytest

from bodo_spark.operators.skew import salted_join, two_stage_distinct_count


def test_salted_join_rejects_right_full(spark):
    big = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1, 2]}))
    small = spark.createDataFrame(pd.DataFrame({"k": [1], "n": ["a"]}))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, "k", how=how)


def test_two_stage_distinct_count_exact(spark):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "g": ["x"] * 60 + ["y"] * 20,
        "u": [i % 7 for i in range(60)] + [i % 13 for i in range(20)]}))
    got = {r["g"]: r["n_distinct"] for r in
           two_stage_distinct_count(df, "g", "u", salt=8).collect()}
    exp = {r["g"]: r["nd"] for r in
           df.groupBy("g").agg(F.countDistinct("u").alias("nd")).collect()}
    assert got == exp == {"x": 7, "y": 13}


def test_two_stage_distinct_nulls(spark):
    """NULL values: countDistinct ignores NULLs; the two-stage path
    must agree."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "g": ["x", "x", "x", "y"],
        "u": [1.0, None, 1.0, None]}))
    got = {r["g"]: r["n_distinct"] for r in
           two_stage_distinct_count(df, "g", "u", salt=4).collect()}
    exp = {r["g"]: r["nd"] for r in
           df.groupBy("g").agg(F.countDistinct("u").alias("nd")).collect()}
    assert got == exp


def test_two_stage_distinct_null_keys(spark):
    """NULL KEY groups: GROUP BY treats NULL as one group with a real
    COUNT(DISTINCT); the re-join of all-keys to counts must be
    null-safe or the NULL-key group collapses to 0."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "g": ["x", None, None, None, "y"],
        "u": [1.0, 5.0, 6.0, 5.0, None]}))
    got = {r["g"]: r["n_distinct"] for r in
           two_stage_distinct_count(df, "g", "u", salt=4).collect()}
    exp = {r["g"]: r["nd"] for r in
           df.groupBy("g").agg(F.countDistinct("u").alias("nd")).collect()}
    assert got == exp == {"x": 1, None: 2, "y": 0}


def test_two_stage_distinct_property(spark):
    """Property-style differential vs GROUP BY + COUNT(DISTINCT) on
    randomized frames with NULLs in BOTH keys and values and varying
    salt widths -- the r6 ADVICE bug (NULL-key groups zeroed by a
    null-unsafe re-join) lived exactly in the space this sweeps.
    Deterministic seed: Spark-session cost makes per-example spawning
    (hypothesis-style) too slow, so this sweeps a fixed grid of seeded
    random cases instead."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(7)
    for case in range(6):
        n = rng.randint(1, 40)
        keys = [rng.choice(["a", "b", None]) for _ in range(n)]
        vals = [rng.choice([1.0, 2.0, 3.0, None]) for _ in range(n)]
        df = spark.createDataFrame(
            pd.DataFrame({"g": keys, "u": vals}),
            "g string, u double")
        salt = rng.choice([1, 2, 8])
        got = {r["g"]: r["n_distinct"] for r in
               two_stage_distinct_count(df, "g", "u", salt=salt).collect()}
        exp = {r["g"]: r["nd"] for r in
               df.groupBy("g").agg(
                   F.countDistinct("u").alias("nd")).collect()}
        assert got == exp, (case, n, salt, got, exp)


def test_two_stage_distinct_multi_key_null(spark):
    """Composite keys with NULL components must match GROUP BY too."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "a": ["x", "x", None, None],
        "b": [None, None, "p", "p"],
        "u": [1.0, 2.0, 3.0, 3.0]}))
    got = {(r["a"], r["b"]): r["n_distinct"] for r in
           two_stage_distinct_count(df, ["a", "b"], "u", salt=4).collect()}
    exp = {(r["a"], r["b"]): r["nd"] for r in
           df.groupBy("a", "b")
             .agg(F.countDistinct("u").alias("nd")).collect()}
    assert got == exp == {("x", None): 2, (None, "p"): 1}
