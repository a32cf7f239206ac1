"""MERGE INTO as a DataFrame transformation (copy-on-write semantics).

Reference parity: Iceberg MERGE INTO COW (reference
bodo/io/iceberg/merge_into.py:33, BodoSQL/bodosql/libs/iceberg_merge_into.py)
executes MERGE as: join target rows against the source, rewrite affected
files. The Spark-first re-expression is exactly that join -- a full outer
join on the merge key with per-row outcome selection -- independent of any
table format. ``merge_into`` returns the merged frame (usable with any
sink); ``merge_into_parquet`` applies it to a parquet table path
copy-on-write style.

Scale design: one shuffle join on the merge key (broadcast when the source
is small -- Catalyst/AQE decides from stats); every other step is a narrow
projection. No collect, no driver loop; the COW rewrite is a distributed
parquet write.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: Mapping[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: Mapping[str, Column] | None = None,
) -> DataFrame:
    """ANSI MERGE semantics over DataFrames; returns the merged target.

    - ``on``: equi-join key column names (present in both frames).
    - ``when_matched_update``: {target_col: expr}; exprs may reference
      target columns by name and source columns as ``src_<col>``.
    - ``when_matched_delete``: optional boolean expr (same references);
      matched rows where it holds are dropped. Evaluated before update,
      mirroring MERGE WHEN MATCHED THEN DELETE clause order.
    - ``when_not_matched_insert``: {target_col: expr} building inserted
      rows from source-only keys (exprs reference ``src_<col>``); omit
      to ignore unmatched source rows.

    Target rows with no source match pass through unchanged. Duplicate
    source keys are the caller's responsibility (ANSI MERGE raises on
    them; here each duplicate emits a row -- pre-aggregate the source;
    checking would cost an extra shuffle).
    """
    t_cols = target.columns
    t = target.withColumn("_t_ex", F.lit(True))
    s = (source.select([F.col(c).alias(f"src_{c}") for c in source.columns])
         .withColumn("_s_ex", F.lit(True)))
    cond = [t[k] == s[f"src_{k}"] for k in on]
    j = t.join(s, cond, "full_outer").select(
        *[t[c].alias(c) for c in t_cols],
        *[s[f"src_{c}"].alias(f"src_{c}") for c in source.columns],
        F.coalesce(t["_t_ex"], F.lit(False)).alias("_t_ex"),
        F.coalesce(s["_s_ex"], F.lit(False)).alias("_s_ex"))
    matched = F.col("_t_ex") & F.col("_s_ex")

    if when_matched_delete is not None:
        # ANSI MERGE deletes only when the condition is TRUE; NULL (3VL
        # unknown) keeps the row, so coalesce before negating -- ~NULL is
        # NULL and where() would otherwise drop the row.
        delete = F.coalesce(when_matched_delete, F.lit(False))
        j = j.where(~F.when(matched, delete).otherwise(F.lit(False)))

    out_cols = []
    for c in t_cols:
        val = F.col(c)
        if when_matched_update and c in when_matched_update:
            val = F.when(matched, when_matched_update[c]).otherwise(val)
        if when_not_matched_insert is not None:
            ins = when_not_matched_insert.get(c, F.lit(None).cast(
                target.schema[c].dataType))
            val = F.when(~F.col("_t_ex"), ins).otherwise(val)
        out_cols.append(val.alias(c))

    j = j if when_not_matched_insert is not None else j.where(F.col("_t_ex"))
    return j.select(*out_cols)


def merge_into_parquet(
    spark,
    path: str,
    source: DataFrame,
    on: list[str],
    **merge_kwargs,
) -> None:
    """Copy-on-write MERGE against a parquet table directory.

    Spark cannot overwrite its own input, and materializing via
    localCheckpoint() before an in-place overwrite is unsafe (blocks live
    on non-replicated executor storage; an executor loss mid-overwrite
    destroys the original with no recovery). So: write the merged result
    to a sibling staging directory first -- a fully durable distributed
    write while the original is untouched -- then swap directories. The
    swap itself is the only non-atomic window and is driver-local metadata
    work; a real lakehouse table (Iceberg/Delta) is this exact operation
    plus an atomic snapshot-pointer commit."""
    import shutil
    import uuid

    target = spark.read.parquet(path)
    merged = merge_into(target, source, on, **merge_kwargs)
    norm = path.rstrip("/")
    staging = f"{norm}.__merge_staging_{uuid.uuid4().hex[:8]}"
    backup = f"{norm}.__merge_backup_{uuid.uuid4().hex[:8]}"
    merged.write.mode("errorifexists").parquet(staging)
    try:
        shutil.move(norm, backup)
        shutil.move(staging, norm)
    except Exception:
        # Local-FS path only; on object stores callers should point a
        # catalog/table pointer at `staging` instead of renaming.
        # shutil can raise shutil.Error (partial cross-device copy) as
        # well as OSError; restore the original and drop staging.
        if not _exists_dir(norm) and _exists_dir(backup):
            shutil.move(backup, norm)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(backup, ignore_errors=True)


def _exists_dir(p: str) -> bool:
    import os

    return os.path.isdir(p)
