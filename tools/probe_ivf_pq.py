"""IVF-PQ scale probe: trained cells (k ∝ n) x trained PQ codebooks
(m=8, k=256) on the scaled embeddings table. Measures index build and
probed-ADC search wall, plus SHORTLIST recall: the fraction of the exact l2 top-10 present in
the 8-probe ADC top-50 -- the number that matters for the
shortlist-then-exact-refine protocol (raw ADC rank quality on RANDOM
uniform vectors is known-poor for PQ; real embedding corpora cluster).

Usage: python tools/probe_ivf_pq.py <sf_dir> [n_queries]
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

    spark = get_spark(app_name="probe_ivf_pq")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n = emb.count()
    n_cells = max(8, n // 256)
    cents = S.train_ivf_centroids(emb, n_centroids=n_cells, seed=1)
    cbs = P.train_pq_codebooks(emb, m=8, k=256, seed=1)
    t0 = time.time()
    idx = P.ivf_pq_index(emb, cbs, n_cells=n_cells, centroids=cents,
                         scorer="blas").persist()
    idx.write.format("noop").mode("overwrite").save()
    build_sec = round(time.time() - t0, 2)

    q = (emb.where(F.col("vec_id") % (n // n_q) == 3).limit(n_q)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")).persist())
    q.count()
    t0 = time.time()
    got = (P.ivf_pq_topk(idx, q, emb, cbs, k=50, n_probe=8,
                         n_cells=n_cells, centroids=cents)
           .where(F.col("vec_id") != F.col("q_id")).collect())
    search_sec = round(time.time() - t0, 2)

    d2 = (dot(F.col("embedding"), F.col("embedding"))
          - 2 * dot(F.col("embedding"), F.col("q_vec")))
    wnd = W.partitionBy("q_id").orderBy(F.col("_d"), F.col("vec_id"))
    exact = {}
    for r in (emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
              .withColumn("_d", d2)
              .withColumn("rn", F.row_number().over(wnd))
              .where("rn <= 10").collect()):
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    gotm = {}
    for r in got:
        gotm.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(gotm.get(k, set()) & v) for k, v in exact.items())
    recall = round(hits / sum(len(v) for v in exact.values()), 3)
    idx.unpersist(); q.unpersist(); unpersist_cached()
    print(json.dumps({"corpus": n, "cells": n_cells,
                      "index_build_sec": build_sec,
                      "probe8_search_sec": search_sec,
                      "shortlist50_recall_at_10": recall}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
