"""Merge-on-read (MoR) table maintenance: the delta-log half of the
lakehouse MERGE design space.

The file-pruned COW merge (merge.merge_into_partitioned) bounds the
per-batch REWRITE by the touched partitions; this module removes the
rewrite entirely: each change batch is APPENDED as a delta segment
(write cost O(batch), full stop), readers reconcile base + deltas at
scan time (latest version per key wins, deletes drop the row), and a
compaction folds the accumulated deltas back into a fresh base when
read amplification crosses the budget. This is the Hudi MoR / Iceberg
v2 position-delete economics re-expressed over plain parquet
directories; the reference gets the equivalent from Iceberg
(bodo/io/iceberg/merge_into.py:33).

Layout under ``path``:
    base/              the compacted table (payload + seq column)
    delta/d-<n>-*.parquet   one directory-free segment per batch,
                       rows = (keys, payload, seq, _op 'U'|'D')

Reconcile semantics (mor_read): among a key's base row (op 'U') and
all its delta rows, the HIGHEST seq wins; ties break delete-first
('D' < 'U' -- the apply_cdc_stream delete-wins convention); a winning
'D' removes the key. One window over base+deltas keyed on the merge
key -- at scale the deltas are a small fraction of the base between
compactions, and compaction (mor_compact) restores zero read
amplification with one COW publish (guarded swap, cow_publish).

Write-path contract mirrors apply_cdc_stream: per-key seq must be
monotone across batches (a replayed batch re-appends rows, but
reconcile picks the same winners -- append + deterministic reconcile
is naturally idempotent for same-content replays at read time; the
mor gate pins a full replay).
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["mor_init", "mor_apply", "mor_read", "mor_compact",
           "mor_delta_stats", "apply_cdc_stream_mor"]

_OP = "_op"


def mor_init(df: DataFrame, path: str, *, seq_col: str = "_cdc_seq",
             mode: str = "errorifexists") -> None:
    """Initialize the MoR table: ``df`` (payload + ``seq_col``) becomes
    the base; the delta log starts empty."""
    if seq_col not in df.columns:
        raise ValueError(f"df lacks seq column {seq_col!r}")
    clash = {c for c in df.columns} & {_OP, "_seq"}
    if clash:
        raise ValueError(f"columns {sorted(clash)} collide with the "
                         "MoR bookkeeping columns (_op, _seq) -- "
                         "rename them")
    df.write.mode(mode).parquet(os.path.join(path, "base"))
    os.makedirs(os.path.join(path, "delta"), exist_ok=True)


def _delta_dirs(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "delta", "d-*")))


def mor_apply(changes: DataFrame, path: str, *, key_cols: list[str],
              op_col: str = "op", src_seq_col: str = "seq") -> str:
    """Apply a change batch as ONE appended delta segment -- the write
    cost is O(batch) regardless of table size (no read of the base, no
    rewrite of anything). Intra-batch disorder is resolved here
    (last-change-per-key by seq desc, delete-wins tiebreak), so each
    segment carries at most one row per key. Returns the segment dir."""
    w = (W.partitionBy(*key_cols)
         .orderBy(F.col(src_seq_col).desc(), F.col(op_col).asc()))
    last = (changes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
    n = len(_delta_dirs(path))
    seg = os.path.join(path, "delta",
                       f"d-{n:06d}-{uuid.uuid4().hex[:8]}")
    (last.withColumnRenamed(op_col, _OP)
     .withColumnRenamed(src_seq_col, "_seq")
     .write.mode("errorifexists").parquet(seg))
    return seg


def mor_read(spark, path: str, *, key_cols: list[str],
             seq_col: str = "_cdc_seq",
             as_of_segment: int | None = None) -> DataFrame:
    """Reconciled current state: base UNION deltas -> one window per
    key picks the highest (seq, delete-first) version; winning deletes
    drop. Returns the base schema (payload + ``seq_col``). Read
    amplification = delta mass scanned on top of the base -- watch
    mor_delta_stats and compact.

    ``as_of_segment=n``: TIME TRAVEL -- reconcile only the first ``n``
    delta segments (0 = the base as-is), i.e. the table state as of
    that append; the delta log doubles as the snapshot history for
    free, exactly the Hudi/Iceberg incremental-read economics. Valid
    between compactions (mor_compact folds consumed segments into the
    base and truncates that history -- a real lakehouse keeps the old
    snapshots; here sources/versioned.py is the retained-history
    twin)."""
    base = spark.read.parquet(os.path.join(path, "base"))
    payload = [c for c in base.columns
               if c not in key_cols and c != seq_col]
    dd = _delta_dirs(path)
    if as_of_segment is not None:
        if not 0 <= as_of_segment <= len(dd):
            raise ValueError(
                f"as_of_segment must be in [0, {len(dd)}], "
                f"got {as_of_segment}")
        dd = dd[:as_of_segment]
    if not dd:
        return base
    b = base.select(
        *key_cols,
        *payload,
        F.col(seq_col).alias("_seq"),
        F.lit("U").alias(_OP))
    d = (spark.read.parquet(*dd)
         .select(*key_cols, *payload, "_seq", _OP))
    un = b.unionByName(d)
    w = (W.partitionBy(*key_cols)
         .orderBy(F.col("_seq").desc(), F.col(_OP).asc()))
    cur = (un.withColumn("_rn", F.row_number().over(w))
           .where((F.col("_rn") == 1) & (F.col(_OP) == "U"))
           .select(*key_cols, *payload,
                   F.col("_seq").alias(seq_col)))
    return cur


def mor_delta_stats(spark, path: str) -> dict:
    """Bounded read-amplification signal: segment count and delta row
    mass vs base rows -- the compaction trigger (compact when
    delta_rows / base_rows or n_segments crosses the budget)."""
    dd = _delta_dirs(path)
    base_rows = spark.read.parquet(os.path.join(path, "base")).count()
    delta_rows = (spark.read.parquet(*dd).count() if dd else 0)
    return {"n_segments": len(dd), "base_rows": base_rows,
            "delta_rows": delta_rows,
            "amplification": (delta_rows / base_rows
                              if base_rows else float("inf"))}


def mor_compact(spark, path: str, *, key_cols: list[str],
                seq_col: str = "_cdc_seq") -> None:
    """Fold the delta log into a fresh base (ONE reconcile pass + one
    COW publish with the guarded-swap discipline) and clear the
    consumed segments. Readers spanning the compaction see either the
    old base+deltas or the new base -- the same state by the reconcile
    invariant."""
    from .merge import cow_publish
    consumed = _delta_dirs(path)
    cur = mor_read(spark, path, key_cols=key_cols, seq_col=seq_col)
    cow_publish(cur, os.path.join(path, "base"))
    import shutil
    for seg in consumed:
        shutil.rmtree(seg, ignore_errors=True)


def apply_cdc_stream_mor(changes: DataFrame, path: str, *,
                         key_cols: list[str], op_col: str = "op",
                         src_seq_col: str = "seq",
                         seq_col: str = "_cdc_seq",
                         compact_every: int | None = None,
                         query_name: str = "cdc_apply_mor",
                         available_now: bool = True):
    """Streaming CDC apply, merge-on-read mode: each micro-batch is ONE
    O(batch) delta append (vs the COW modes' read+rewrite);
    ``compact_every`` folds the log into the base every N batches (the
    maintenance knob -- readers pay the delta scan until then). The
    stream_cdc_apply_mor gate pins the reconciled table against the
    SAME oracle as the COW modes: three designs, one state."""

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        if not bdf.take(1):
            return
        mor_apply(bdf, path, key_cols=key_cols, op_col=op_col,
                  src_seq_col=src_seq_col)
        if compact_every and len(_delta_dirs(path)) >= compact_every:
            mor_compact(bdf.sparkSession, path, key_cols=key_cols,
                        seq_col=seq_col)

    q = (changes.writeStream.queryName(query_name)
         .foreachBatch(apply_batch)
         .option("checkpointLocation", f"{path}__mor_ckpt"))
    if available_now:
        sq = q.trigger(availableNow=True).start()
        sq.awaitTermination()
        return sq
    return q.start()
