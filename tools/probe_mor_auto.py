"""MoR auto-pruned CROSSOVER probe: with the BASE FIXED, at what delta
mass does the broadcast-pruned reconcile (mor_read pruned=True -- the
full-width delta winner set is broadcast) stop beating the
shuffle-based full window (pruned=False)? This calibrates the
`broadcast_budget_bytes` default that mor_read(pruned='auto') and
mor_compact key their plan choice on (r13 verdict task 1: the one place
scale posture relied on operator discipline).

Builds ONE wide incompressible base (the probe_mor_read payload
discipline), then for each delta FRACTION applies a fresh upsert batch
of that mass and measures both reconcile variants over the same on-disk
state, reporting the delta's on-disk bytes (the exact statistic
_resolve_pruned consults).

Usage: python tools/probe_mor_auto.py [base_rows [frac ...]]
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


def main() -> None:
    from bodo_spark.operators import mor as M
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_mor_auto")
    args = sys.argv[1:]
    n = int(args[0]) if args else 8_000_000
    fracs = [float(a) for a in args[1:]] or [0.001, 0.01, 0.1, 0.3]
    h = lambda o: F.sha2((F.col("id") + o).cast("string"), 256)  # noqa: E731
    base = (spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.concat(h(0), h(1), h(2), h(3)).alias("pay"),
        F.lit(0).cast("long").alias("_cdc_seq")))
    results = []
    for frac in fracs:
        stage = f"/tmp/bodo_probe_mora_{uuid.uuid4().hex[:8]}"
        try:
            M.mor_init(base, f"{stage}/t")
            step = max(1, int(1 / frac))
            up = (spark.range(n)
                  .where(F.col("id") % step == 0)
                  .select(F.col("id").alias("k"),
                          F.lit(-1.0).alias("v"),
                          F.concat(h(7), h(8), h(9), h(10))
                          .alias("pay"),
                          F.lit("U").alias("op"),
                          F.lit(1).cast("long").alias("seq")))
            M.mor_apply(up, f"{stage}/t", key_cols=["k"])
            db = M._tree_bytes(*M._delta_dirs(f"{stage}/t"))
            walls = {}
            for tag, pruned in (("pruned_s", True), ("window_s", False)):
                t0 = time.time()
                (M.mor_read(spark, f"{stage}/t", key_cols=["k"],
                            pruned=pruned)
                 .write.format("noop").mode("overwrite").save())
                walls[tag] = round(time.time() - t0, 2)
            row = {"base_rows": n, "frac": frac,
                   "delta_mb": round(db / (1 << 20), 1), **walls,
                   "pruned_vs_window": round(
                       walls["pruned_s"] / max(walls["window_s"],
                                               1e-9), 2)}
            results.append(row)
            print(row, flush=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
