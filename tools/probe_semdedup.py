"""SemDeDup scale ladder (operators/similarity.py semantic_dedup).

The intra-cell self-join is the algorithm's intrinsic O(sum c_i^2);
the published mitigation (SemDeDup, arXiv:2303.09540 -- 50k clusters
for LAION-440M) is cell count PROPORTIONAL to corpus size, keeping
E[c] constant. This probe measures both sides of that claim on the
scaled embeddings table:

  1. scaled cells (k = n/TARGET_CELL): the production configuration --
     wall time should track corpus size ~linearly;
  2. fixed cells (k = 8, the oracle-gate configuration): cells grow
     O(n), pair count grows O(n^2/k) -- run only at the smaller scales
     to show the blowup the mitigation removes (skipped when the
     estimated pair count exceeds --pairs-cap, default 2e9).

Centroids come from train_ivf_centroids (seeded sample k-means): the
trained path exercises exactly what a real corpus would run; the
lowest-id default exists for oracle determinism, not scale.

Usage: python tools/probe_semdedup.py <sf_dir> [target_cell_size]
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

    from bodo_spark.operators import similarity as S
    from bodo_spark.operators.dedup import unpersist_cached
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_semdedup")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n = emb.count()

    def run(n_cells: int, label: str, scorer: str = "blas") -> dict:
        cents = S.train_ivf_centroids(emb, n_centroids=n_cells, seed=1)
        t0 = time.time()
        kept = S.semantic_dedup(emb, eps=0.5, centroids=cents,
                                scorer=scorer).count()
        sec = round(time.time() - t0, 2)
        unpersist_cached()
        spark.catalog.clearCache()
        out = {"mode": label, "scorer": scorer, "n": n, "cells": n_cells,
               "kept": kept, "dropped": n - kept, "sec": sec}
        print(json.dumps(out), flush=True)
        return out

    k_scaled = max(8, n // target)
    results = [run(k_scaled, "scaled_cells", "blas")]
    if n <= 500_000:  # expr/blas A-B: identical survivors, wall compared
        r_expr = run(k_scaled, "scaled_cells", "expr")
        assert r_expr["kept"] == results[0]["kept"], \
            (r_expr["kept"], results[0]["kept"])
    # fixed-8-cells blowup demonstration, bounded: est pairs ~ n^2/(2*8)
    if n * n / 16 <= 2e9:
        results.append(run(8, "fixed_8_cells"))
    else:
        print(json.dumps({"mode": "fixed_8_cells", "n": n,
                          "skipped": "estimated pairs > 2e9 "
                          "(the blowup the scaled-cells config removes)"}),
              flush=True)
    print(json.dumps({"sf_dir": sf, "rows": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
