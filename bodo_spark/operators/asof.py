"""merge_asof: as-of (nearest-key temporal) join.

Reference parity: pd.merge_asof (reference
bodo/hiframes/dataframe_impl.py:3768; backward/forward/nearest and
allow_exact_matches). Spark has no built-in as-of join; this implements
it as union + window last-non-null -- one shuffle on (by, time), no
range explosion:

    left  rows: (by, t, side=0, left cols)
    right rows: (by, t, side=1, right payload struct)
    sort within by-partition on (t, side) -> a running
    last(payload, ignorenulls) gives each left row the most recent
    right row with right.t <= left.t  (>= for direction='forward').

At 100 TB this is strictly better than the naive range-join (which
explodes into |left| x |right| candidate pairs per key): cost is one
hash shuffle + one or two sorts, the same plan shape Spark uses for any
window. direction='nearest' runs BOTH scan directions over the same
shuffled partitioning (Catalyst reuses the exchange; only the second
sort is extra) and keeps the closer match per row.

Ties: with allow_exact_matches=True (default) right rows sort before
left rows at equal t, so t_right == t_left matches; with False they
sort after, so equal keys never match (pandas semantics). If several
right rows share (by, t) the last one in (by, t, tiebreak) order wins
-- pass a deduplicated right side for full determinism. For
direction='nearest' an exact distance tie prefers the backward match
(pandas tie rule).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: Optional[str] = None,
    by: Optional[str | list[str]] = None,
    left_on: Optional[str] = None,
    right_on: Optional[str] = None,
    left_by: Optional[str | list[str]] = None,
    right_by: Optional[str | list[str]] = None,
    direction: str = "backward",
    tolerance: Optional[Column] = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join; every left row keeps at most one right match.

    Parameters mirror pd.merge_asof. ``tolerance`` is an optional Column
    interval/numeric: matches farther than it are nulled out.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    l_on = left_on or on
    r_on = right_on or on
    if l_on is None or r_on is None:
        raise ValueError("must pass `on` or `left_on`/`right_on`")
    l_by = _as_list(left_by if left_by is not None else by)
    r_by = _as_list(right_by if right_by is not None else by)
    if len(l_by) != len(r_by):
        raise ValueError("left_by and right_by must have equal length")

    # right payload = all right columns not used as keys, renamed on collision
    l_cols = set(left.columns)
    payload_cols = [c for c in right.columns if c not in (*r_by, r_on)]
    out_names = {c: (c + suffix if c in l_cols else c) for c in payload_cols}

    key_cols = [F.col(c).alias(f"__by{i}") for i, c in enumerate(l_by)]
    r_key_cols = [F.col(c).alias(f"__by{i}") for i, c in enumerate(r_by)]

    lhs = left.select(
        *key_cols,
        F.col(l_on).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
        F.lit(None).cast(right.schema[r_on].dataType).alias("__rt"),
    )
    rhs = right.select(
        *r_key_cols,
        F.col(r_on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*payload_cols).alias("__rrow"),
        F.col(r_on).alias("__rt"),
    )
    unioned = lhs.unionByName(rhs)

    by_names = [f"__by{i}" for i in range(len(l_by))]
    # At equal __t, right rows scan before left rows when exact matches
    # are allowed (side desc: 1 then 0) and after them when not (side
    # asc), which is exactly the inclusive/strict boundary.
    side = F.col("__side").desc() if allow_exact_matches \
        else F.col("__side").asc()

    def scan(descending: bool):
        order = [F.col("__t").desc() if descending else F.col("__t").asc(),
                 side]
        return (W.partitionBy(*by_names).orderBy(*order)
                .rowsBetween(W.unboundedPreceding, W.currentRow))

    matched = unioned
    if direction in ("backward", "nearest"):
        wb = scan(descending=False)
        matched = (matched
                   .withColumn("__mrow_b",
                               F.last("__rrow", ignorenulls=True).over(wb))
                   .withColumn("__mt_b",
                               F.last("__rt", ignorenulls=True).over(wb)))
    if direction in ("forward", "nearest"):
        wf = scan(descending=True)
        matched = (matched
                   .withColumn("__mrow_f",
                               F.last("__rrow", ignorenulls=True).over(wf))
                   .withColumn("__mt_f",
                               F.last("__rt", ignorenulls=True).over(wf)))
    matched = matched.where(F.col("__side") == 0)

    if direction == "backward":
        matched = (matched.withColumn("__mrow", F.col("__mrow_b"))
                   .withColumn("__mt", F.col("__mt_b")))
    elif direction == "forward":
        matched = (matched.withColumn("__mrow", F.col("__mrow_f"))
                   .withColumn("__mt", F.col("__mt_f")))
    else:  # nearest: closer of the two scans; distance tie -> backward
        db = F.col("__t") - F.col("__mt_b")
        df_ = F.col("__mt_f") - F.col("__t")
        take_b = F.col("__mt_b").isNotNull() & (
            F.col("__mt_f").isNull() | (db <= df_))
        matched = (matched
                   .withColumn("__mrow", F.when(take_b, F.col("__mrow_b"))
                               .otherwise(F.col("__mrow_f")))
                   .withColumn("__mt", F.when(take_b, F.col("__mt_b"))
                               .otherwise(F.col("__mt_f"))))

    if tolerance is not None:
        if direction == "backward":
            delta = F.col("__t") - F.col("__mt")
        elif direction == "forward":
            delta = F.col("__mt") - F.col("__t")
        else:
            delta = F.greatest(F.col("__t") - F.col("__mt"),
                               F.col("__mt") - F.col("__t"))
        in_tol = F.col("__mt").isNotNull() & (delta <= tolerance)
        matched = (matched
                   .withColumn("__mrow", F.when(in_tol, F.col("__mrow")))
                   .withColumn("__mt", F.when(in_tol, F.col("__mt"))))

    out = matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__mrow.{c}").alias(out_names[c]) for c in payload_cols],
    )
    return out


def _as_list(v) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)
