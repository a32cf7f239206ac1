"""Record linkage: blocked fuzzy join between TWO tables -- the
entity-matching primitive (Fellegi-Sunter blocking + string-similarity
scoring) the dedup family's within-corpus machinery doesn't cover:
match a dirty feed (typos, truncations) against a clean master table.

Protocol: a cheap BLOCKING key bounds the candidate pairs (join on it;
without blocking the cross product is |L| x |R|), every candidate pair
is scored with the validated Jaro-Winkler kernel
(functions/snowflake.jaro_winkler_batch -- Arrow-batched, bit-matched
against DuckDB's jaro_winkler_similarity), thresholded, and optionally
reduced to the best match per left row.

Determinism contract: scores are compared as the Snowflake-style
integer ``floor(100 * jw + 0.5)`` (the str_jaro_winkler gate's form --
an integer can't straddle a cross-engine ulp the way a raw-double
threshold can); best-match ties break to the lowest right key.

Scale: work = sum over blocks of |L_b| x |R_b| -- the blocking key IS
the scale lever (the LSH-banding argument applied to entity
resolution); the scoring pass is one Arrow-batched projection over
candidate pairs, and the best-match reduction is a
map-side-combinable min(struct), no window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def fuzzy_join(left: DataFrame, right: DataFrame, *,
               left_key: str, right_key: str,
               left_col: str, right_col: str,
               left_block: Column, right_block: Column,
               threshold: float = 0.9,
               keep: str = "best") -> DataFrame:
    """Returns matches ``(left_key, right_key, score100)`` with
    score100 = floor(100*jw + 0.5) >= round(threshold*100).
    ``keep='best'``: one row per left key (highest score, ties to the
    lowest right key); ``keep='all'``: every passing pair."""
    if keep not in ("best", "all"):
        raise ValueError(f"keep must be 'best' or 'all', got {keep!r}")
    from ..functions.snowflake import jaro_winkler_batch

    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler_batch(a.tolist(), b.tolist()))

    min_s = int(round(threshold * 100))
    l = left.select(F.col(left_key).alias("_lk"),
                    F.col(left_col).alias("_ln"),
                    left_block.alias("_blk"))
    r = right.select(F.col(right_key).alias("_rk"),
                     F.col(right_col).alias("_rn"),
                     right_block.alias("_blk"))
    cand = l.join(r, "_blk")
    scored = (cand.withColumn(
        "score100",
        F.floor(F.lit(100) * _jw(F.col("_ln"), F.col("_rn"))
                + F.lit(0.5)).cast("int"))
        .where(F.col("score100") >= min_s)
        .select(F.col("_lk").alias(left_key),
                F.col("_rk").alias(right_key), "score100"))
    if keep == "all":
        return scored
    best = (scored.groupBy(left_key)
            .agg(F.min(F.struct((-F.col("score100")).alias("ns"),
                                F.col(right_key).alias("rk"))).alias("_b"))
            .select(left_key, F.col("_b.rk").alias(right_key),
                    (-F.col("_b.ns")).cast("int").alias("score100")))
    return best
