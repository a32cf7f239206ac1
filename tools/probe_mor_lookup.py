"""MoR point-lookup serving probe: on a wide BUCKETED base, compare
mor_lookup (engine-derived bucket IN partition filter + key pushdown)
against the naive serving read a user writes -- mor_read().where(k
IN ...) -- which pushes the key predicate into the scans but opens
EVERY bucket directory (the bucket hash is underivable from the
predicate; PartitionFilters stays empty). The gap is the listing +
footer + row-group-pruning cost of every untouched bucket dir, i.e.
the part that grows with TABLE size while the lookup's real work
stays bound by keys + delta mass.

Usage: python tools/probe_mor_lookup.py [base_rows [n_buckets]]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bodo_spark.operators import mor as M
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_mor_lookup")
    args = sys.argv[1:]
    n = int(args[0]) if args else 8_000_000
    nb = int(args[1]) if len(args) > 1 else 256
    h = lambda o: F.sha2((F.col("id") + o).cast("string"), 256)  # noqa: E731
    stage = f"/tmp/bodo_probe_morlk_{uuid.uuid4().hex[:8]}"
    try:
        base = (spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.concat(h(0), h(1), h(2), h(3)).alias("pay"),
            F.lit(0).cast("long").alias("_cdc_seq")))
        M.mor_init(base, f"{stage}/t", key_cols=["k"], n_buckets=nb)
        up = (spark.range(1000).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("v"),
            F.concat(h(7), h(8), h(9), h(10)).alias("pay"),
            F.lit("U").alias("op"),
            F.lit(1).cast("long").alias("seq")))
        M.mor_apply(up, f"{stage}/t", key_cols=["k"])
        keys = [7, 500, 40_000, n // 2, n - 3]
        results = {}
        for tag in ("lookup", "filtered_read", "lookup2",
                    "filtered_read2"):
            t0 = time.time()
            if tag.startswith("lookup"):
                rows = M.mor_lookup(spark, f"{stage}/t", keys,
                                    key_cols=["k"]).collect()
            else:
                rows = (M.mor_read(spark, f"{stage}/t",
                                   key_cols=["k"])
                        .where(F.col("k").isin(keys)).collect())
            results[tag] = round(time.time() - t0, 2)
            assert len(rows) == len(keys), (tag, len(rows))
        print(json.dumps({"base_rows": n, "n_buckets": nb,
                          **results}))
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
