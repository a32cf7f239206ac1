"""Bloom-ingest scale probe (operators/bloom.py): does the membership
prefilter actually beat the plain anti join at corpus scale?

Protocol (per sf dir): corpus = documents; index built once (timed
separately -- it is amortized over every future ingest). Two batches:

  - fresh: 1% of the corpus re-texted to be guaranteed-new -> the
    Bloom path should answer from the (tiny) word table alone; under
    AQE the empty candidate set collapses the confirm join and the
    corpus is never scanned;
  - half-dup: same batch but half the rows replay corpus texts -> the
    confirm join runs over the corpus' key column (one narrow scan).

Each is measured against the plain `batch LEFT ANTI corpus ON
md5(text)` twin, results asserted identical (exactness is the
operator's contract, so the probe enforces it at every scale).

Usage: python tools/probe_bloom.py <sf_dir>
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
    sf = sys.argv[1]
    from bodo_spark.operators import bloom as B
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_bloom")
    d = (spark.read.parquet(os.path.join(sf, "documents.parquet"))
         .select("doc_id", "text"))
    n = d.count()
    m_bits, k = B.bloom_params(n, fpp=0.01)
    key = F.md5("text")

    stage = f"/tmp/bodo_spark_probe_bloom_{uuid.uuid4().hex[:8]}"
    try:
        t0 = time.time()
        B.write_bloom_index(d, stage, key, m_bits=m_bits, k=k)
        t_index = round(time.time() - t0, 2)
        words = B.read_bloom_index(spark, stage).cache()
        words.count()

        base = d.where(F.col("doc_id") % 100 == 0)
        fresh = base.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("fresh "), F.col("doc_id").cast("string"),
                     F.lit(" "), F.col("text")).alias("text"))
        halfdup = base.select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            # base ids are all multiples of 100 -- split on the
            # hundreds digit, not id parity (id % 2 is always 0 here)
            F.when((F.col("doc_id") / 100) % 2 == 0, F.col("text"))
            .otherwise(F.concat(F.lit("new "),
                                F.col("doc_id").cast("string"))).alias("text"))

        def timed_count(df):
            t0 = time.time()
            c = df.count()
            return c, round(time.time() - t0, 2)

        out = {"sf_dir": sf, "corpus": n, "m_bits": m_bits, "k": k,
               "index_sec": t_index, "batches": {}}
        from bodo_spark.operators.dedup import unpersist_cached
        for name, batch in [("fresh", fresh), ("half_dup", halfdup)]:
            batch = batch.cache()
            nb = batch.count()
            bloom_n, bloom_sec = timed_count(B.exact_new_rows(
                batch, d, key, key, words=words, m_bits=m_bits, k=k))
            unpersist_cached()
            anti = (batch.withColumn("_k", key)
                    .join(d.select(key.alias("_k")), "_k", "left_anti"))
            anti_n, anti_sec = timed_count(anti)
            assert bloom_n == anti_n, (name, bloom_n, anti_n)
            out["batches"][name] = {
                "batch": nb, "new": bloom_n,
                "bloom_sec": bloom_sec, "anti_sec": anti_sec,
                "speedup": round(anti_sec / bloom_sec, 2) if bloom_sec else None}
            print(json.dumps({name: out["batches"][name]}), flush=True)
            batch.unpersist()
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
