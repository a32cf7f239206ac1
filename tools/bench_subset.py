"""Focused bench for scale probes: run a NAMED subset of registry
queries against a given sf dir with the same protocol as bench.py
(fast mode, warm-up, per-query noop sink, cache release + GC between
queries). Usage:

    python tools/bench_subset.py <sf_dir> q18_large_volume_customer ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from bodo_spark.queries import all_queries
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="bodo_spark_bench_subset")
    qs = all_queries()
    qs[names[0]].fn(spark, sf_dir).count()  # warm
    times = {}
    for name in names:
        t0 = time.time()
        qs[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        from bodo_spark.operators.dedup import unpersist_cached
        unpersist_cached()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"sf_dir": sf_dir, "queries": times,
                      "total": round(sum(times.values()), 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
