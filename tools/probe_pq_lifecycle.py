"""PQ index-lifecycle drift probe: how much searchable quality does a
stale codebook cost once appended data drifts off the training
distribution, and how much does compaction (retrain + re-encode) buy
back?

Scenario: train IVF-PQ (trained centroids + m=8/k=256 codebooks) on the
base corpus; append a drifted batch (x -> 0.5x + 3.0 per coordinate --
shifted AND variance-shrunk, so the stale codewords straddle it badly)
encoded with the STALE codebooks; then compact. Reports, for queries
drawn from the DRIFT region:

- reconstruction MSE of the combined index, stale vs compacted
  (operators/pq.pq_reconstruction_mse -- the staleness signal the
  maintenance loop watches), and
- shortlist recall@10 (exact-l2 top-10 found in the 8-probe ADC
  top-50), stale vs compacted -- the end-to-end number that decides
  when re-encoding pays.

Usage: python tools/probe_pq_lifecycle.py <sf_dir> [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def main() -> None:
    sf = sys.argv[1]
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bodo_spark.operators import pq as P
    from bodo_spark.operators import similarity as S
    from bodo_spark.operators.dedup import unpersist_cached
    from bodo_spark.operators.similarity import dot
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_pq_lifecycle")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    base = emb.where(F.col("vec_id") % 5 != 0).select("vec_id", "embedding")
    drift = (emb.where(F.col("vec_id") % 5 == 0)
             .select((F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: (x * F.lit(0.5) + F.lit(3.0))
                                 .cast("float")).alias("embedding")))
    union = base.unionByName(drift).persist()
    n, n_base = union.count(), base.count()
    n_cells = max(8, n // 256)

    cents0 = S.train_ivf_centroids(base, n_centroids=n_cells, seed=1)
    cbs0 = P.train_pq_codebooks(base, m=8, k=256, seed=1)
    t0 = time.time()
    stale_idx = P.pq_append(
        P.ivf_pq_index(base, cbs0, centroids=cents0, scorer="blas"),
        drift, cbs0, centroids=cents0, scorer="blas").persist()
    stale_idx.write.format("noop").mode("overwrite").save()
    append_sec = round(time.time() - t0, 2)

    t0 = time.time()
    cents1 = S.train_ivf_centroids(union, n_centroids=n_cells, seed=1)
    cbs1 = P.train_pq_codebooks(union, m=8, k=256, seed=1)
    fresh_idx = P.ivf_pq_index(union, cbs1, centroids=cents1,
                               scorer="blas").persist()
    fresh_idx.write.format("noop").mode("overwrite").save()
    compact_sec = round(time.time() - t0, 2)

    mse_stale = P.pq_reconstruction_mse(union, stale_idx, cbs0).collect()[0]
    mse_fresh = P.pq_reconstruction_mse(union, fresh_idx, cbs1).collect()[0]

    q = (drift.orderBy("vec_id").limit(n_q)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")).persist())
    q.count()

    d2 = (dot(F.col("embedding"), F.col("embedding"))
          - 2 * dot(F.col("embedding"), F.col("q_vec")))
    wnd = W.partitionBy("q_id").orderBy(F.col("_d"), F.col("vec_id"))
    exact: dict = {}
    for r in (union.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
              .withColumn("_d", d2)
              .withColumn("rn", F.row_number().over(wnd))
              .where("rn <= 10").collect()):
        exact.setdefault(r.q_id, set()).add(r.vec_id)

    def recall(idx, cbs, cents):
        got: dict = {}
        for r in (P.ivf_pq_topk(idx, q, union, cbs, k=50, n_probe=8,
                                n_cells=n_cells, centroids=cents)
                  .where(F.col("vec_id") != F.col("q_id")).collect()):
            got.setdefault(r.q_id, set()).add(r.vec_id)
        hits = sum(len(got.get(k, set()) & v) for k, v in exact.items())
        return round(hits / sum(len(v) for v in exact.values()), 3)

    r_stale = recall(stale_idx, cbs0, cents0)
    r_fresh = recall(fresh_idx, cbs1, cents1)
    stale_idx.unpersist(); fresh_idx.unpersist()
    union.unpersist(); q.unpersist(); unpersist_cached()
    print(json.dumps({
        "corpus": n, "cells": n_cells, "drift_rows": n - n_base,
        "append_sec": append_sec, "compact_sec": compact_sec,
        "mse_stale": mse_stale.mse, "mse_compacted": mse_fresh.mse,
        "recall_stale": r_stale, "recall_compacted": r_fresh}),
        flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
