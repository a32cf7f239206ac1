"""Streaming CDC apply: an upsert/delete change stream maintained into
a parquet table -- the lakehouse "apply changes" primitive (Debezium ->
MERGE per micro-batch), built from the engine's own COW MERGE
(operators/merge.merge_into_parquet) inside foreachBatch.

Change rows carry the key columns, the payload columns, an ``op``
column ('U' upsert / 'D' delete) and a monotone ``seq``. Per batch:

  1. last-change-per-key WITHIN the batch (row_number by seq desc --
     intra-batch disorder is fully handled);
  2. ONE MERGE against the table: matched + 'D' + newer seq -> delete;
     matched + newer seq -> update payload and stored seq; unmatched
     AND op != 'D' -> insert (the conditional-insert clause -- a
     delete for a never-existing key is a no-op, not a row).

The table stores the applied ``seq`` per row (``seq_col``), and every
matched clause is guarded by ``src_seq > seq``, so a batch REPLAYED or
delivered late can never regress a row to an older version (the
exactly-once-effect guard foreachBatch needs, since it is
at-least-once). Ordering contract, stated honestly: per-key changes
must not be SPLIT across batches out of order (the Debezium/Kafka
per-key-partition guarantee) -- a physical delete leaves no tombstone,
so an older upsert arriving in a LATER batch would resurrect the row;
within a batch any order is fine.

Scale: each micro-batch costs one MERGE join (current table x
last-per-key batch -- the batch side broadcasts when small) and one
COW rewrite; on a real lakehouse the same foreachBatch body targets
an Iceberg/Delta MERGE and the rewrite becomes a snapshot commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_cdc_stream"]


def apply_cdc_stream(changes: DataFrame, path: str, *,
                     key_cols: list[str], op_col: str = "op",
                     seq_col: str = "_cdc_seq",
                     src_seq_col: str = "seq",
                     query_name: str = "cdc_apply",
                     available_now: bool = True):
    """Start (and, under AvailableNow, await) the CDC maintenance
    query. The table at ``path`` must already exist with the payload
    schema plus ``seq_col``; payload columns are every table column
    except keys and ``seq_col``."""
    from pyspark.sql import Window as W

    from ..operators.merge import merge_into_parquet

    spark = changes.sparkSession

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        if not bdf.take(1):
            return
        w = (W.partitionBy(*key_cols)
             .orderBy(F.col(src_seq_col).desc()))
        last = (bdf.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))
        table_cols = spark.read.parquet(path).columns
        payload = [c for c in table_cols
                   if c not in key_cols and c != seq_col]
        newer = F.col(f"src_{src_seq_col}") > F.col(seq_col)
        upd = {c: F.when(newer, F.col(f"src_{c}")).otherwise(F.col(c))
               for c in payload}
        upd[seq_col] = (F.when(newer, F.col(f"src_{src_seq_col}"))
                        .otherwise(F.col(seq_col)))
        ins = {c: F.col(f"src_{c}") for c in key_cols + payload}
        ins[seq_col] = F.col(f"src_{src_seq_col}")
        merge_into_parquet(
            spark, path, last, on=list(key_cols),
            when_matched_delete=(F.col(f"src_{op_col}") == "D") & newer,
            when_matched_update=upd,
            when_not_matched_insert=ins,
            when_not_matched_insert_condition=(
                F.col(f"src_{op_col}") != "D"))

    q = (changes.writeStream.queryName(query_name)
         .foreachBatch(apply_batch)
         .option("checkpointLocation", f"{path}__cdc_ckpt"))
    if available_now:
        sq = q.trigger(availableNow=True).start()
        sq.awaitTermination()
        return sq
    return q.start()
