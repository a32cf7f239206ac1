"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (session.py) handles most skew at runtime by
splitting oversized sort-merge partitions. Salting is the explicit,
planner-independent tool for the pathological case -- a big-big join
where a handful of hot keys would otherwise pin whole partitions to
single tasks (the reference hits the same wall in its MPI hash
partitioning; its planner falls back to broadcast or rebalancing).

Mechanics: the probe side adds a deterministic salt in [0, n) derived
by hashing its OTHER columns (never random -- task retries must
reproduce the same salt); the build side is replicated n times, once
per salt value. The join key becomes (key, salt), spreading each hot
key over n tasks at the cost of replicating the build side n-fold --
use for hot-key subsets, not whole tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted ``salt_n`` ways and
    the right side replicated per salt. Result equals
    ``left.join(right, on, how)`` (column order included); only the
    physical key distribution changes."""
    if salt_n < 1:
        raise ValueError("salt_n must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "semi", "left_semi", "leftsemi",
                   "anti", "left_anti", "leftanti"):
        # right/full joins would emit each unmatched BUILD row once per
        # salt replica -- wrong multiplicity by construction
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "the replicated build side would duplicate unmatched right "
            "rows")
    other = [c for c in left.columns if c != on] or [on]
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other]),
                         F.lit(salt_n)).cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("__salt")
    r = right.select("*", salts)
    out = l.join(r, [on, "__salt"], how).drop("__salt")
    # restore the plain equi-join's column order: key, left rest, right rest
    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    return out.select(on, *lcols, *rcols)


def two_stage_distinct_count(df: DataFrame, keys: str | list[str],
                             value: str, salt: int = 32,
                             out_col: str = "n_distinct") -> DataFrame:
    """COUNT(DISTINCT value) per key without funneling each hot key's
    whole distinct set through one reducer: stage 1 dedups on
    (key, hash(value) % salt, value) -- the hot key's values spread
    over ``salt`` reducers -- stage 2 sums per-salt distinct counts
    (sub-sets are disjoint by construction, so the sum is exact).

    This is the salting twin of Spark's own two-phase rewrite for
    single distinct aggregates; it stays available where the planner's
    rewrite doesn't apply (multiple distincts alongside, streaming
    foreachBatch, explicit control). Salt derives from the VALUE
    (deterministic, like salted_join's hash-derived salt)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    bucket = F.pmod(F.xxhash64(F.col(value)), F.lit(salt)).alias("_vb")
    stage1 = (df.where(F.col(value).isNotNull())  # COUNT(DISTINCT) skips NULL
              .select(*ks, bucket, F.col(value))
              .distinct()
              .groupBy(*ks, "_vb")
              .agg(F.count(F.lit(1)).alias("_n")))
    counts = (stage1.groupBy(*ks)
              .agg(F.sum("_n").cast("bigint").alias(out_col)))
    # groups whose values are ALL NULL must still appear (count 0),
    # exactly like GROUP BY + COUNT(DISTINCT). GROUP BY treats NULL as
    # one group, so the re-join must match NULL keys too: eqNullSafe,
    # not USING-list equality (which would zero out NULL-key groups
    # that have real distinct values).
    allkeys = df.select(*ks).distinct()
    c = counts
    for k in ks:
        c = c.withColumnRenamed(k, f"_r_{k}")
    cond = None
    for k in ks:
        e = allkeys[k].eqNullSafe(c[f"_r_{k}"])
        cond = e if cond is None else cond & e
    return (allkeys.join(c, cond, "left")
            .select(*ks, F.coalesce(F.col(out_col), F.lit(0))
                    .cast("bigint").alias(out_col)))
