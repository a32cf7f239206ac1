"""Capture .explain("formatted") for named registry queries at sf0.1.

Writes <outdir>/<query>_<tag>.txt for each query. The frame is executed
through the noop sink first so the AdaptiveSparkPlan prints its FINAL
plan (AQE-resolved joins/coalescing), then explain("formatted") is
captured. Used for the plans/r14 before/after audit artifacts.

Usage: python tools/capture_plans.py <outdir> <tag> <query> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from bodo_spark.queries import all_queries
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    qs = all_queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name].fn(spark, sf)
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # still capture the initial plan
            print(f"WARN {name}: noop failed: {e}", file=sys.stderr)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt", flush=True)
        from bodo_spark.operators.dedup import unpersist_cached
        unpersist_cached()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
