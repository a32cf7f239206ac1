"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per BASELINE.md the operative baseline is hand-written PySpark on the same
data, so the target is simply: no query regresses vs a straightforward
Spark plan (we ARE Spark; the win is plan quality -- broadcasts, pushdown,
exact-decimal aggs, AQE).
"""

from __future__ import annotations

import json
import os
import time

# Benchmarks measure the fast numeric path (plain double arithmetic --
# identical to hand-written PySpark). The exact-decimal path exists for
# bit-reproducible results and is what the correctness gate runs; see
# bodo_spark/modes.py. Hard-assign (not setdefault): an inherited
# BODO_SPARK_EXACT=1 must never silently flip the bench into the 2.5-4x
# slower md5/decimal mode -- that made BENCH artifacts undiagnosable.
os.environ["BODO_SPARK_EXACT"] = "0"


# dedup_minhash_lsh cost profile (sf0.1, local[32], fast mode): the
# signature build dominates. r4 persisted it (MEMORY_AND_DISK) so the
# three consuming branches compute it once (~7.9 s). r5 cut the build
# itself: Kirsch-Mitzenmacher double hashing derives all 16 permutation
# hashes from 2 xxhash64 calls per shingle, and word_shingles became a
# zip_with chain over shifted slices instead of per-position
# transform+slice (higher-order lambdas evaluate interpreted; measured
# ~6x). Current cost ~3.9 s, still the most expensive headline entry.
# NOTE bench hosts vary up to ~3x run-to-run in this container -- judge
# deltas against same-run q1/q3 before calling a regression.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_profit_by_nation_year",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_suppliers_kept_waiting",
    "win_running_sum",
    "dt_sessionize",
    "join_asof_events",
    "text_quality_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_pipeline_e2e",
    "emb_pipeline_e2e",
    # round-10 tiers: PQ-compressed ANN and the one-pass data card
    "ann_pq_topk",
    "sketch_dataset_profile",
    # round-11 tiers: index lifecycle and per-language routing
    "ann_index_compact",
    "cur_pretrain_multilang",
    # round-11 retrieval/compression tiers: lexical BM25 and SQ8 ANN
    "text_bm25_topk",
    "ann_sq_topk",
    # round-12 tiers: file-pruned MERGE and the composed
    # text -> vector -> indexed-ANN route
    "merge_file_pruned",
    "emb_tfidf_ivf_sq_topk",
    # round-13 tiers: cell-pruned stored ANN serving and the bucketed
    # MoR lifecycle (pruned read + touched-dirs-only compaction)
    "ann_sq_stored_prune",
    "stream_cdc_apply_mor_bucketed",
    # round-14 tier: the incremental index-maintenance composition
    # (CDC-maintained MoR table -> incremental pull -> stored-index
    # append, nothing rebuilt)
    "ann_mor_incremental_index",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bodo_spark.queries import all_queries
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="bodo_spark_bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # also run any extra headline-worthy ops present
    for n in ("dedup_minhash_lsh", "ann_cosine_topk", "text_quality_stats"):
        if n in qs and n not in names:
            names.append(n)

    # warm the JVM/codegen with one cheap action (cold-start excluded, same
    # protocol as the reference's pds-benchmark: first run not counted)
    qs[names[0]].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    stats: dict[str, dict] = {}
    sc = spark.sparkContext
    for name in names:
        sc.setJobGroup(name, name)
        t0 = time.time()
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        sc.setJobGroup("", "")
        stats[name] = _job_group_stats(spark, name)
        # Release operator-cached blocks AFTER the timed run: persisted
        # intermediates (dedup signature frame etc.) otherwise accumulate
        # across the session and contend with later queries' execution
        # memory -- at 10x data (tools/scale_testdata.py) that measurably
        # inflated later entries. Outside the timer: each query's own
        # persist benefit is part of its measured cost, the residue not.
        from bodo_spark.operators.dedup import unpersist_cached
        unpersist_cached()
        spark.catalog.clearCache()
        # Also force a JVM GC between queries (still outside the timer):
        # without it, garbage accumulated across the session lands as a
        # 10-15 s major-GC pause INSIDE a later query's timed window
        # (observed reproducibly on the last headline entry: 17-19 s
        # with the pause vs 3-4 s when collection happens here).
        spark.sparkContext._jvm.System.gc()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Truncation-proofing (r4/r5 artifacts lost early per-query times to
    # tail-truncation): the bulky per-query stage/shuffle stats go out
    # FIRST on their own line (and to a sidecar file), and the summary
    # JSON -- the numbers that matter -- is printed LAST so it always
    # survives a stored tail.
    stats_line = {"bench_query_stats": stats}
    print(json.dumps(stats_line), flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_STATS.json"), "w") as f:
            json.dump(stats_line, f, indent=1)
    except OSError:
        pass
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
        # diagnosability (r2 bench-anomaly postmortem): the artifact must
        # self-describe which numeric mode produced it; per-query work
        # profiles live on the bench_query_stats line / BENCH_STATS.json.
        "mode": "exact" if os.environ.get("BODO_SPARK_EXACT", "0") != "0"
                else "fast",
    }
    print(json.dumps(out), flush=True)
    spark.stop()


def _job_group_stats(spark, group: str) -> dict:
    """Tasks + shuffle bytes for every job in ``group``, from the local
    Spark UI REST API (statusTracker alone has no shuffle metrics).
    Best-effort: {} when the UI is disabled."""
    try:
        import urllib.request

        sc = spark.sparkContext
        tracker = sc.statusTracker()
        stage_ids = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info is not None:
                stage_ids.update(info.stageIds)
        base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
        with urllib.request.urlopen(base, timeout=10) as r:
            all_stages = json.loads(r.read())
        agg = {"stages": 0, "tasks": 0,
               "shuffle_write_bytes": 0, "shuffle_read_bytes": 0}
        for st in all_stages:
            if st.get("stageId") in stage_ids and st.get("status") != "SKIPPED":
                agg["stages"] += 1
                agg["tasks"] += st.get("numCompleteTasks", 0)
                agg["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
                agg["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        return agg
    except Exception:
        return {}


if __name__ == "__main__":
    main()
