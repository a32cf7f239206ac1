"""BM25 hot-term (stopword) probe: measure what a universal token costs
the scoring pass, and what max_df_ratio pruning buys back.

Setup: every document gets a planted universal token ("zzcommon" --
df = N, the stopword/boilerplate class). A query containing that token
plus two normal terms is ranked against (a) the unpruned index and
(b) the index built with max_df_ratio=0.5 (which drops the planted
term at BUILD time). The hot term's posting list is corpus-sized, so
the unpruned scored pass processes ~N extra rows per query containing
it; its idf is ~ln(1 + 0.5/(N+0.5)) ~ 0 -- near-zero ranking mass for
corpus-sized cost, which is the argument for pruning.

Also reports the top-k overlap between the two rankings (the honest
recall cost of pruning: how much the near-zero-idf term actually moved
the ranking).

Usage: python tools/probe_bm25_skew.py [sf_dir] [n_rounds]
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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from bodo_spark.operators import retrieval as R
    from bodo_spark.queries._util import tbl
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_bm25_skew")
    d = (tbl(spark, sf, "documents")
         .select("doc_id",
                 F.concat(F.col("text"), F.lit(" zzcommon"))
                 .alias("text")))
    n_docs = d.count()
    q = (d.where(F.col("doc_id") < 3)
         .select(F.col("doc_id").alias("q_id"),
                 F.concat(F.lit("zzcommon "),
                          F.array_join(F.slice(F.split(F.trim("text"),
                                                       "\\s+"), 1, 4),
                                       " ")).alias("q_text")))

    # Stage BOTH indexes + stats to parquet ONCE (the stored-index
    # serving deployment), then time ONLY the ranking pass -- the cost
    # the hot posting list actually adds per query batch.
    import shutil
    import uuid
    stage = f"/tmp/bodo_probe_bm25_{uuid.uuid4().hex[:8]}"
    arts = {}
    for name, ratio in (("full", None), ("pruned", 0.5)):
        idx = R.bm25_index(d, max_df_ratio=ratio)
        idx.write.mode("overwrite").parquet(f"{stage}/{name}/idx")
        ts, cs = R.bm25_corpus_stats(
            spark.read.parquet(f"{stage}/{name}/idx"))
        ts.write.mode("overwrite").parquet(f"{stage}/{name}/ts")
        cs.write.mode("overwrite").parquet(f"{stage}/{name}/cs")
        arts[name] = (spark.read.parquet(f"{stage}/{name}/idx"),
                      spark.read.parquet(f"{stage}/{name}/ts"),
                      spark.read.parquet(f"{stage}/{name}/cs"))

    def rank(name):
        idx, ts, cs = arts[name]
        return R.bm25_topk(idx, q, k=10, term_stats=ts, corpus_stats=cs)

    def best_of(name, n=rounds):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            rank(name).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    try:
        hot_rows = arts["full"][0].where(
            F.col("term") == "zzcommon").count()
        pruned_hot = arts["pruned"][0].where(
            F.col("term") == "zzcommon").count()
        t_full = best_of("full")
        t_pruned = best_of("pruned")
        a = {(r.q_id, r.doc_id) for r in rank("full").collect()}
        b = {(r.q_id, r.doc_id) for r in rank("pruned").collect()}
        print(json.dumps({
            "sf_dir": sf, "n_docs": n_docs,
            "hot_term_postings": hot_rows,
            "hot_term_postings_pruned": pruned_hot,
            "rank_sec_unpruned": t_full,
            "rank_sec_pruned": t_pruned,
            "topk_overlap": len(a & b) / max(len(a), 1)}), flush=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
