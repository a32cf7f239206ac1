"""Skew probe for cap_per_key (the per-domain document cap): one
mega-domain holds almost all rows -- the naive row_number window puts
its entire occupancy in ONE task; the two-level top-k bounds every
first-pass partition at occupancy/salt. Both are run (naive skipped
above --naive-max) and the survivor sets asserted identical.

Usage: python tools/probe_domain_cap.py [n_mega ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"

NAIVE_MAX = 10_000_000


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000,
                                               50_000_000]
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bodo_spark.operators import curation as C
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_domain_cap")
    for n in sizes:
        # rows carry a ~1 KB payload: the window sorts FULL rows, so the
        # naive single-task sort moves the mega-domain's entire text
        # mass through one task -- the realistic shape (narrow rows
        # understate the skew penalty by 10-100x)
        df = (spark.range(n + 5000)
              .select(F.col("id").alias("doc_id"),
                      F.when(F.col("id") < n, F.lit("mega"))
                      .otherwise(F.concat(F.lit("d"),
                                          (F.col("id") % 50)
                                          .cast("string")))
                      .alias("source"),
                      F.repeat(F.concat(F.lit("tok"),
                                        (F.col("id") % 97)
                                        .cast("string"), F.lit(" ")),
                               150).alias("text"))
              .persist())
        df.count()
        # consume the survivors' TEXT (sum of lengths): without this,
        # Catalyst prunes the payload before the window and the naive
        # sort moves only (source, hash, id) -- unrepresentatively fast
        t0 = time.time()
        kept = C.cap_per_key(df, 1000, key_col="source",
                             id_col="doc_id", salt=32)
        n_kept, _mass = kept.agg(
            F.count(F.lit(1)), F.sum(F.length("text"))).collect()[0]
        two_sec = round(time.time() - t0, 2)
        naive_sec = None
        if n <= NAIVE_MAX:
            h = C.u01_hash("doc_id")
            w = W.partitionBy("source").orderBy(h, "doc_id")
            t0 = time.time()
            naive = (df.withColumn("_rn", F.row_number().over(w))
                     .where(F.col("_rn") <= 1000).drop("_rn"))
            n_naive, _m2 = naive.agg(
                F.count(F.lit(1)), F.sum(F.length("text"))).collect()[0]
            naive_sec = round(time.time() - t0, 2)
            assert _m2 == _mass, (_m2, _mass)
            assert n_naive == n_kept, (n_naive, n_kept)
        df.unpersist()
        spark.catalog.clearCache()
        print(json.dumps({"mega_rows": n, "kept": n_kept,
                          "two_level_sec": two_sec,
                          "naive_window_sec": naive_sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
