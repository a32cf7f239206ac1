"""Job timeline for one registry query: per-job wall (submission ->
completion) plus the DRIVER GAP since the previous job's completion --
the planning/listing/py4j/lock time no stage metric shows. Guide 7.3:
when wall >> summed stage time, the driver is the bottleneck; this
prints where.

Usage: python tools/job_timeline.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def _iso(ts):
    from datetime import datetime
    return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bodo_spark.queries import all_queries
    from bodo_spark.session import get_spark

    spark = get_spark(app_name=f"job_timeline_{name}")
    qs = all_queries()
    sc = spark.sparkContext
    qs["q6_forecast_revenue"].fn(spark, sf_dir).count()
    from bodo_spark.operators.dedup import unpersist_cached
    unpersist_cached()
    spark.catalog.clearCache()

    jb = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
    with urllib.request.urlopen(jb, timeout=10) as r:
        seen = {j["jobId"] for j in json.loads(r.read())}

    t0 = time.time()
    qs[name].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    wall = time.time() - t0

    with urllib.request.urlopen(jb, timeout=10) as r:
        jobs = [j for j in json.loads(r.read()) if j["jobId"] not in seen]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"query={name} wall={wall:.2f}s jobs={len(jobs)}")
    print(f"{'job':>4} {'gap_ms':>7} {'run_ms':>7} {'tasks':>5}  name")
    prev_end = None
    tot_gap = tot_run = 0.0
    for j in jobs:
        sub = _iso(j["submissionTime"])
        end = _iso(j["completionTime"]) if j.get("completionTime") else sub
        gap = (sub - prev_end) * 1000 if prev_end is not None else 0.0
        run = (end - sub) * 1000
        tot_gap += max(gap, 0)
        tot_run += run
        nm = (j.get("name") or "").split("\n")[0][:90]
        print(f"{j['jobId']:>4} {gap:>7.0f} {run:>7.0f} "
              f"{j.get('numTasks', 0):>5}  {nm}")
        prev_end = end
    print(f"total: job_run={tot_run/1000:.2f}s inter_job_gap="
          f"{tot_gap/1000:.2f}s wall={wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
