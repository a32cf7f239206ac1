"""File-pruned MERGE probe: is the per-batch merge cost bound by the
TOUCHED-partition size (merge_into_partitioned) instead of the table
size (merge_into_parquet's full COW rewrite)?

Builds synthetic key/value tables at increasing row counts, stored
bucket-partitioned (256 buckets), then applies the SAME tiny change
batch (8 keys -> <= 8 touched buckets) both ways and measures the
wall. Expectation: the COW wall grows ~linearly with the table, the
pruned wall stays ~flat (touched slice is ~8/256 of the table at any
size, and the swap is driver-local metadata work).

Usage: python tools/probe_pruned_merge.py [rows ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bodo_spark.operators.merge import (merge_into_parquet,
                                            merge_into_partitioned,
                                            write_bucket_partitioned)
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_pruned_merge")
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000,
                                               50_000_000]
    results = []
    # warmup: absorb JVM/codegen startup so the first ladder row is
    # comparable to the rest
    warm = spark.range(10_000).select(F.col("id").alias("k"),
                                      F.lit(0.0).alias("v"))
    wsrc = spark.createDataFrame([(1, 1.0)], "k long, v double")
    wstage = f"/tmp/bodo_probe_fpm_warm_{uuid.uuid4().hex[:8]}"
    try:
        warm.write.parquet(wstage)
        merge_into_parquet(spark, wstage, wsrc, ["k"],
                           when_matched_update={"v": F.col("src_v")})
    finally:
        shutil.rmtree(wstage, ignore_errors=True)
    for n in sizes:
        # WIDE, INCOMPRESSIBLE rows (~256 B of hash payload): the
        # COW-vs-pruned question is about data volume rewritten per
        # batch; narrow or snappy-compressible payloads make even a
        # full rewrite I/O-trivial at probe sizes
        h = lambda o: F.sha2((F.col("id") + o).cast("string"), 256)  # noqa: E731
        base = (spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.lit(0).cast("long").alias("seq"),
            F.concat(h(0), h(1), h(2), h(3)).alias("pay")))
        src = spark.createDataFrame(
            [(int(i * (n // 10)), 1.0, 1) for i in range(8)],
            "k long, v double, seq long")
        clauses = dict(
            when_matched_update={"v": F.col("src_v"),
                                 "seq": F.col("src_seq")})
        stage = f"/tmp/bodo_probe_fpm_{uuid.uuid4().hex[:8]}"
        try:
            # plain COW: unpartitioned table, full rewrite per merge
            base.write.parquet(f"{stage}/cow")
            t0 = time.time()
            merge_into_parquet(spark, f"{stage}/cow", src, ["k"],
                               **clauses)
            cow_wall = round(time.time() - t0, 2)
            # pruned: 256-bucket table, touched buckets only
            write_bucket_partitioned(base, f"{stage}/pruned", ["k"],
                                     256)
            t0 = time.time()
            touched = merge_into_partitioned(
                spark, f"{stage}/pruned", src, ["k"], n_buckets=256,
                **clauses)
            pruned_wall = round(time.time() - t0, 2)
            # value sanity at the probed size
            a = spark.read.parquet(f"{stage}/cow").where(
                F.col("seq") == 1).count()
            b = spark.read.parquet(f"{stage}/pruned").where(
                F.col("seq") == 1).count()
            assert a == b == 8, (a, b)
            row = {"rows": n, "cow_merge_s": cow_wall,
                   "pruned_merge_s": pruned_wall,
                   "touched_buckets": len(touched),
                   "speedup": round(cow_wall / max(pruned_wall, 1e-9),
                                    1)}
            results.append(row)
            print(row, flush=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    import json
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
