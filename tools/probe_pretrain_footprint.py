"""Peak-footprint probe for the pretrain_pipeline capstone (VERDICT r9
task 1's SCALE note): samples persisted-block storage while the
composed pipeline runs, in BOTH boundary-materialization modes.

- mode=checkpoint (localCheckpoint): blocks live in MEMORY_AND_DISK;
  peak = how many tier boundaries are simultaneously live.
- mode=staged (checkpoint_dir): boundaries are parquet on disk; peak
  block storage should stay ~zero and the staged dir size is the
  footprint (durable, lineage-truncated -- the 100-TB mode).

Usage: python tools/probe_pretrain_footprint.py <sf_dir> [mode...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    sf = sys.argv[1]
    modes = sys.argv[2:] or ["checkpoint", "staged"]
    from pyspark.sql import functions as F

    from bodo_spark.operators import curation as C
    from bodo_spark.operators.dedup import unpersist_cached
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_pretrain_footprint")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
        .select("doc_id", "source", F.col("lang"), "text")
    bench = docs.where(F.col("doc_id") % 19 == 0) \
        .select("doc_id", "text")
    jsc = spark.sparkContext._jsc.sc()

    for mode in modes:
        stage = f"/tmp/bodo_pt_probe_{mode}"
        shutil.rmtree(stage, ignore_errors=True)
        peak = {"mem": 0, "disk": 0, "staged": 0}
        stop = threading.Event()

        def sample():
            while not stop.is_set():
                # statusStore().rddList is the py4j-friendly storage
                # view (getRDDStorageInfo returns a Scala array py4j
                # cannot iterate); a handle can still go stale between
                # fetch and read -- skip that sample, not the thread
                try:
                    mem = disk = 0
                    rdds = jsc.statusStore().rddList(False)
                    for i in range(rdds.size()):
                        r = rdds.apply(i)
                        mem += r.memoryUsed()
                        disk += r.diskUsed()
                    peak["mem"] = max(peak["mem"], mem)
                    peak["disk"] = max(peak["disk"], disk)
                except Exception:
                    pass
                if os.path.isdir(stage):
                    peak["staged"] = max(peak["staged"], du(stage))
                time.sleep(0.5)

        t = threading.Thread(target=sample, daemon=True)
        t.start()
        t0 = time.time()
        out = C.pretrain_pipeline(
            docs, bench=bench, span=20, pplx_p=0.2, pplx_sketch_k=65535,
            mix_weights=None, quality_weights=None, capacity=256,
            checkpoint_dir=stage if mode == "staged" else None)
        n = out.count()
        sec = round(time.time() - t0, 2)
        stop.set()
        t.join(timeout=2)
        unpersist_cached()
        spark.catalog.clearCache()
        print(json.dumps({
            "mode": mode, "rows": n, "sec": sec,
            "peak_block_mem_mb": round(peak["mem"] / 1e6, 1),
            "peak_block_disk_mb": round(peak["disk"] / 1e6, 1),
            "peak_staged_mb": round(peak["staged"] / 1e6, 1)}),
            flush=True)
        shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
