"""Stored-ANN serving probe: is sq_stored_topk's per-query-batch cost
bound by the PROBED cells' directories (PartitionFilters pruning)
rather than the corpus size -- and what does the same search cost
without the stored cell layout (flat scan over all codes)?

Synthesizes deterministic 64-dim corpora at increasing sizes, builds
ONE IVF-SQ index per size stored cell-partitioned (64 cells), then
times the SERVING path alone (3 queries, n_probe=2, best-of-3) against
the flat sq_topk scan of the same stored codes. Expectation: the
pruned serve reads ~probed/64 of the index and its wall grows with
that share; the flat scan grows with the corpus.

Usage: python tools/probe_ann_stored.py [rows ...]
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

DIM = 64
N_CELLS = 64


def _corpus(spark, n):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000))
                   .cast("double") / F.lit(1000.0)))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))


def _serve(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    from bodo_spark.operators import sq as Q
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_ann_stored")
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000,
                                               4_000_000]
    results = []
    for n in sizes:
        corpus = _corpus(spark, n)
        queries = (corpus.where(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
        stage = f"/tmp/bodo_probe_annst_{uuid.uuid4().hex[:8]}"
        try:
            t0 = time.time()
            los, his = Q.sq_train(corpus)
            idx = Q.ivf_sq_index(corpus, los, his, n_cells=N_CELLS)
            Q.sq_store_index(idx, stage, los, his, n_cells=N_CELLS,
                             seed_vectors=corpus)
            build_s = round(time.time() - t0, 2)
            pruned_s = _serve(lambda: Q.sq_stored_topk(
                spark, stage, queries, k=5, n_probe=2))
            # the unpruned twin: the SAME stored codes, flat-scanned
            codes = spark.read.parquet(f"{stage}/index").drop("cell")
            flat_s = _serve(lambda: Q.sq_topk(
                codes, queries, los, his, k=5))
            # sanity: pruned serving returns k rows per query
            got = Q.sq_stored_topk(spark, stage, queries, k=5,
                                   n_probe=2).count()
            assert got == 15, got
            row = {"rows": n, "build_store_s": build_s,
                   "serve_pruned_s": pruned_s, "serve_flat_s": flat_s,
                   "speedup": round(flat_s / max(pruned_s, 1e-9), 2)}
            results.append(row)
            print(row, flush=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
