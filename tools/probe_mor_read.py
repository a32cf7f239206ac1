"""MoR read + compaction probe: with DELTA MASS FIXED, does the
reconciled-read cost stay scan-bound as the base grows (the pruned
anti/semi split) instead of paying a full-base shuffle (the naive
union+window reconcile)? And is bucketed compaction bound by the
touched-partition mass while plain compaction rewrites the base?

Builds wide incompressible tables (the probe_pruned_merge payload
discipline) at increasing row counts, stored as BUCKETED MoR tables
(256 key-hash buckets), applies the same two tiny delta batches
(~800 keys), then measures: pruned vs full-window reconciled read,
and bucketed (touched-dirs-only) vs plain (full COW) compaction.

Usage: python tools/probe_mor_read.py [rows ...]
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


def _deltas(spark, n):
    # SMALL change mass (16 keys -> <= 16 of 256 buckets), the
    # probe_pruned_merge calibration: the claim under test is cost
    # bound by the CHANGE mass, so the change must be small relative
    # to the bucket count (an 800-key batch touches ~246/256 buckets
    # and the "pruned" compaction degenerates to a full rewrite with
    # per-directory overhead -- measured before this calibration)
    ks = [int(i * (n // 16)) for i in range(8)]
    up = spark.createDataFrame(
        [(k, 1.0, "upd", 1) for k in ks],
        "k long, v double, pay string, seq long") \
        .select("k", "v", F.concat(F.sha2(F.col("pay"), 256),
                                   F.sha2(F.col("pay"), 256))
                .alias("pay"), "seq",
                F.lit("U").alias("op")) \
        .select("k", "v", "pay", "op", "seq")
    dl = spark.createDataFrame(
        [(k + 1, 2) for k in ks],
        "k long, seq long") \
        .select("k", F.lit(None).cast("double").alias("v"),
                F.lit(None).cast("string").alias("pay"),
                F.lit("D").alias("op"), "seq")
    return up, dl


def main() -> None:
    from bodo_spark.operators import mor as M
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_mor_read")
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000,
                                               32_000_000]
    results = []
    for n in sizes:
        h = lambda o: F.sha2((F.col("id") + o).cast("string"), 256)  # noqa: E731
        base = (spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.concat(h(0), h(1), h(2), h(3)).alias("pay"),
            F.lit(0).cast("long").alias("_cdc_seq")))
        up, dl = _deltas(spark, n)
        stage = f"/tmp/bodo_probe_morr_{uuid.uuid4().hex[:8]}"
        try:
            M.mor_init(base, f"{stage}/bkt", key_cols=["k"],
                       n_buckets=256)
            M.mor_apply(up, f"{stage}/bkt", key_cols=["k"])
            M.mor_apply(dl, f"{stage}/bkt", key_cols=["k"])
            walls = {}
            for tag, pruned in (("read_full_s", False),
                                ("read_pruned_s", True)):
                t0 = time.time()
                (M.mor_read(spark, f"{stage}/bkt", key_cols=["k"],
                            pruned=pruned)
                 .write.format("noop").mode("overwrite").save())
                walls[tag] = round(time.time() - t0, 2)
            # bucketed compaction: touched dirs only
            t0 = time.time()
            M.mor_compact(spark, f"{stage}/bkt", key_cols=["k"])
            walls["compact_pruned_s"] = round(time.time() - t0, 2)
            n_bkt = spark.read.parquet(f"{stage}/bkt/base").count()
            # plain MoR table: same deltas, full-COW compaction
            M.mor_init(base, f"{stage}/plain")
            M.mor_apply(up, f"{stage}/plain", key_cols=["k"])
            M.mor_apply(dl, f"{stage}/plain", key_cols=["k"])
            t0 = time.time()
            M.mor_compact(spark, f"{stage}/plain", key_cols=["k"])
            walls["compact_cow_s"] = round(time.time() - t0, 2)
            n_plain = spark.read.parquet(f"{stage}/plain/base").count()
            assert n_bkt == n_plain == n - 8, (n_bkt, n_plain)
            row = {"rows": n, **walls,
                   "read_speedup": round(
                       walls["read_full_s"]
                       / max(walls["read_pruned_s"], 1e-9), 2),
                   "compact_speedup": round(
                       walls["compact_cow_s"]
                       / max(walls["compact_pruned_s"], 1e-9), 2)}
            results.append(row)
            print(row, flush=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
