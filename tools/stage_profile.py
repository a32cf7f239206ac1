"""Per-stage wall/CPU attribution for one registry query.

Runs <query> once (noop sink, fast mode, warm-up action first) and
prints every completed stage of the run sorted by executorRunTime:
stage id, task count, run/cpu/gc millis, shuffle bytes, and the first
line of the stage's callsite name. This is the guide-7.1 "which stage
is slow" loop in scriptable form -- wall-clock alone cannot attribute
a lifecycle gate (init/apply/compact/read) to its phases.

Usage: python tools/stage_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bodo_spark.queries import all_queries
    from bodo_spark.session import get_spark

    spark = get_spark(app_name=f"stage_profile_{name}")
    qs = all_queries()
    sc = spark.sparkContext
    # warm the JVM on a cheap query, as bench.py does
    qs["q6_forecast_revenue"].fn(spark, sf_dir).count()
    from bodo_spark.operators.dedup import unpersist_cached
    unpersist_cached()
    spark.catalog.clearCache()

    import urllib.request
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    with urllib.request.urlopen(base, timeout=10) as r:
        seen = {st["stageId"] for st in json.loads(r.read())}

    t0 = time.time()
    qs[name].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    wall = time.time() - t0

    with urllib.request.urlopen(base, timeout=10) as r:
        stages = [st for st in json.loads(r.read())
                  if st["stageId"] not in seen
                  and st.get("status") != "SKIPPED"]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    jb = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
    with urllib.request.urlopen(jb, timeout=10) as r:
        jobs = json.loads(r.read())
    stage_job = {}
    for j in jobs:
        for sid in j.get("stageIds", []):
            stage_job[sid] = (j["jobId"], (j.get("name") or "")
                              .split("\n")[0][:60])
    tot_run = sum(s.get("executorRunTime", 0) for s in stages)
    tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
    print(f"query={name} wall={wall:.2f}s stages={len(stages)} "
          f"tasks={sum(s.get('numCompleteTasks', 0) for s in stages)} "
          f"sum_run={tot_run/1e3:.1f}s sum_cpu={tot_cpu/1e3:.1f}s")
    print(f"{'id':>5} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8} "
          f"{'gc_ms':>6} {'sh_r_kb':>8} {'sh_w_kb':>8}  name")
    for st in stages[:40]:
        nm = (st.get("name") or "").split("\n")[0][:60]
        jid, jname = stage_job.get(st["stageId"], ("?", ""))
        print(f"{st['stageId']:>5} {st.get('numCompleteTasks', 0):>5} "
              f"{st.get('executorRunTime', 0):>8} "
              f"{int(st.get('executorCpuTime', 0)/1e6):>8} "
              f"{st.get('jvmGcTime', 0):>6} "
              f"{int(st.get('shuffleReadBytes', 0)/1024):>8} "
              f"{int(st.get('shuffleWriteBytes', 0)/1024):>8}  "
              f"j{jid} {nm} | {jname}")
    spark.stop()


if __name__ == "__main__":
    main()
