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
