"""Production-mode scale probe for incremental SemDeDup
(similarity.semantic_dedup_between): the GATE runs the deterministic
8-cell oracle mode, which is O(batch * n/8) by design and therefore
deliberately not laddered (the same note as emb_semantic_dedup,
SCALE.md r9). Production uses k-means cells with k PROPORTIONAL to
corpus size (SemDeDup's published mitigation), keeping cell occupancy
-- and hence batch-row cost -- constant as the corpus grows. This
probe measures exactly that: index 90% of the (scaled) embeddings
table with k = n/TARGET trained cells, dedup the held-out 10% + 100
planted exact replays against it, and pin that every replay drops.

Usage: python tools/probe_semdedup_ingest.py <sf_dir> [target_cell]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"

TARGET_CELL = 256


def main() -> None:
    sf = sys.argv[1]
    target = int(sys.argv[2]) if len(sys.argv) > 2 else TARGET_CELL
    from pyspark.sql import functions as F

    from bodo_spark.operators import similarity as S
    from bodo_spark.operators.dedup import unpersist_cached
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_semdedup_ingest")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    n = corpus.count()
    k = max(8, n // target)
    cents = S.train_ivf_centroids(corpus, n_centroids=k, seed=1)
    planted = (corpus.orderBy("vec_id").limit(100)
               .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000)))
    batch = (emb.where(F.col("vec_id") % 10 == 0).unionByName(planted)
             .persist())
    n_batch = batch.count()

    t0 = time.time()
    idx = S.semantic_cell_index(corpus, cents).persist()
    idx.write.format("noop").mode("overwrite").save()
    index_sec = round(time.time() - t0, 2)

    t0 = time.time()
    kept = S.semantic_dedup_between(batch, idx, cents, eps=0.999)
    n_kept = kept.count()
    probe_sec = round(time.time() - t0, 2)
    planted_dropped = (n_batch - n_kept) >= 100
    idx.unpersist()
    batch.unpersist()
    unpersist_cached()
    print(json.dumps({"corpus": n, "cells": k, "batch": n_batch,
                      "kept": n_kept, "all_replays_dropped":
                      planted_dropped, "index_sec": index_sec,
                      "dedup_sec": probe_sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
