"""Z-order clustered writes: multi-column data skipping.

Sorting a table by one column gives perfect parquet min/max pruning on
that column and none on the others; interleaving the bit patterns of
several columns' bucket ranks (a Z-/Morton curve) gives GOOD pruning on
every clustered column at once -- the layout trick behind lakehouse
OPTIMIZE ZORDER.

Scale design: per-column bucket boundaries come from approxQuantile
(driver-side list of <= 2^bits doubles -- tiny); bucketing + bit
interleave are pure JVM expressions; the layout is a repartitionByRange
+ sortWithinPartitions on the z-value (one range shuffle, the same
cost as any global sort-write). No collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(col: Column, bounds: list[float]) -> Column:
    """Rank of value within the quantile ``bounds`` (0..len(bounds)):
    a CASE ladder over <= 2^bits literal boundaries, evaluated in
    codegen."""
    out = F.lit(0)
    for b in bounds:
        out = out + F.when(col > F.lit(b), 1).otherwise(0)
    return out


def z_value(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bucket rank into one Morton key
    (column i contributes bit b at position b * n_cols + i)."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for i, c in enumerate(buckets):
        ci = c.cast("long")
        for b in range(bits):
            bit = F.shiftright(ci, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)  # disjoint positions
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 8, n_files: int | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` to parquet clustered on the Z-curve of ``cols``
    (numeric). Each output file then covers a tight hyper-rectangle of
    the clustered columns, so min/max row-group pruning works for
    filters on ANY of them."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("cluster on 1-4 numeric columns")
    n_buckets = (1 << bits) - 1
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_cols = []
    for c in cols:
        bounds = df.approxQuantile(c, probs, 0.001)
        # dedupe boundary plateaus to keep the ladder short
        uniq = sorted(set(bounds))
        bucket_cols.append(_bucketize(F.col(c).cast("double"), uniq))
    zc = z_value(bucket_cols, bits).alias("__z")
    out = df.select("*", zc)
    n_files = n_files or df.sparkSession.sparkContext.defaultParallelism
    (out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode).parquet(path))
