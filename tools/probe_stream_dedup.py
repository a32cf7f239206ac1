"""Scale probe: streaming incremental dedup vs its batch twin at the
production shape -- corpus indexed once (amortized), a ~1% batch
deduped against the index, once through minhash_lsh_pairs_between
(batch) and once through stream_minhash_flags (Structured Streaming,
multi-file stream). Reports both walls and asserts identical pairs.

Usage: python tools/probe_stream_dedup.py <sf_dir> [batch_fraction_denom]
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
    sf_dir = sys.argv[1]
    denom = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    from pyspark.storagelevel import StorageLevel

    from bodo_spark.operators import dedup as D
    from bodo_spark.queries._util import tbl
    from bodo_spark.session import get_spark
    from bodo_spark.streaming import (read_stream_parquet,
                                      run_available_now,
                                      stream_minhash_flags)

    spark = get_spark(app_name="probe_stream_dedup")
    d = tbl(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % denom != 0)
    new = (d.where(F.col("doc_id") % denom == 0)
           .select("doc_id", "text"))

    t0 = time.time()
    corpus_sig = (D.minhash_signatures(corpus)
                  .persist(StorageLevel.MEMORY_AND_DISK))
    n_corpus = corpus_sig.count()  # materialize the index
    t_index = round(time.time() - t0, 2)

    t0 = time.time()
    batch_pairs = {(r.new_id, r.corpus_id) for r in
                   D.minhash_lsh_pairs_between(new, corpus_sig).collect()}
    t_batch = round(time.time() - t0, 2)

    stage = f"/tmp/bodo_spark_sdprobe_{uuid.uuid4().hex[:8]}"
    new.repartition(4).write.mode("overwrite").parquet(stage)
    t0 = time.time()
    stream = read_stream_parquet(spark, stage, new.schema,
                                 max_files_per_trigger=1)
    got = run_available_now(
        stream_minhash_flags(stream, corpus_sig),
        f"t_sdprobe_{uuid.uuid4().hex[:8]}", output_mode="append")
    stream_pairs = {(r.new_id, r.corpus_id) for r in got.collect()}
    t_stream = round(time.time() - t0, 2)
    shutil.rmtree(stage, ignore_errors=True)

    print(json.dumps({
        "sf_dir": sf_dir, "n_corpus": n_corpus,
        "n_batch_docs": new.count(), "index_sec": t_index,
        "batch_sec": t_batch, "stream_sec": t_stream,
        "pairs": len(stream_pairs),
        "pairs_match": stream_pairs == batch_pairs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
