"""Scale probe for decontamination at the REAL production shape:
benchmark (eval set) size FIXED while the training corpus grows.

The registry gate (cur_decontaminate) slices the benchmark as
doc_id % 19 == 0, which grows with the corpus -- right for an oracle
check, wrong for a scale claim (real eval sets are MBs regardless of
corpus size). Here the benchmark is the first ~2.6k docs (the sf0.1
slice size) at every scale, so measured growth isolates the corpus
scan + broadcast-semi cost.

Usage: python tools/probe_decontaminate.py <sf_dir> [bench_docs]
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
    sf_dir = sys.argv[1]
    bench_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2600
    from bodo_spark.operators import curation as C
    from bodo_spark.queries._util import tbl
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_decontaminate")
    d = tbl(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") < bench_docs)
    train = d.where(F.col("doc_id") >= bench_docs)
    train.count()  # warm scan
    t0 = time.time()
    n_bad = C.contaminated_ids(train, bench, k=5).count()
    wall = round(time.time() - t0, 3)
    print(json.dumps({"sf_dir": sf_dir, "bench_docs": bench_docs,
                      "contaminated": n_bad, "sec": wall}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
