"""Adversarial duplicate-skew probe for the LSH family (VERDICT r8
"What's wrong #1"): a web-scale corpus contains mega-clusters --
identical or near-identical boilerplate replicated 10^5..10^6 times.
Every member shares every band signature, so band buckets of size c
produce O(c^2) candidate rows BEFORE verification; no synthetic-corpus
probe exercised that quadratic path.

This probe plants a mega-cluster into a (scaled) corpus and measures:

1. the analytic candidate count sum_buckets occ*(occ-1)/2 (cheap: one
   groupBy over the banded frame -- never runs the quadratic join);
2. the naive `minhash_lsh_pairs` wall time at growing cluster sizes
   (skipped above --naive-max, where the join is deliberately left
   unrun);
3. the mitigated paths:
   a. byte-identical cluster -> `collapse_exact_texts` first
      (near_dup_survivors' order): candidates return to baseline,
      ZERO recall loss -- survivor set equals the unplanted corpus's
      survivors plus exactly one cluster representative;
   b. near-identical cluster (per-copy unique suffix token, so
      collapse can't help) -> `max_band_occupancy` cap: candidates
      bounded, pairs OUTSIDE the cluster identical to the uncapped
      run on the unplanted corpus.

`--mega-span` probes the analogous axis of the SUBSTRING dedup
(VERDICT r9 "What's wrong #1"): a boilerplate ``span``-token block
repeated in 10^5+ docs makes each of its positional grams a corpus-wide
hot key. The pre-r10 formulation (`row_number` over
`Window.partitionBy(gh)`) sorted each hot gram's entire occurrence
cluster in ONE task; the map-side-combined min(struct)+anti-join
formulation must hold wall time ~flat in c, with excision content
pinned (every non-canonical copy loses exactly the planted block).

Usage: python tools/probe_lsh_skew.py <sf_dir> [c1 c2 ...]
       python tools/probe_lsh_skew.py <sf_dir> --mega-span [c1 c2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"  # production mode

from pyspark.sql import functions as F  # noqa: E402

BOILER = ("lorem ipsum boiler plate navigation footer text repeated "
          "across the whole web corpus body terms privacy contact")


def _corpus(spark, sf):
    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    return d.select("doc_id", "text")


def _planted(spark, base, c, *, identical: bool):
    start = 10_000_000
    suffix = (F.lit("") if identical
              else F.concat(F.lit(" v"), F.col("id").cast("string")))
    mega = (spark.range(start, start + c)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit(BOILER), suffix).alias("text")))
    return base.union(mega)


def _candidates(df):
    """Analytic candidate-row count of the band self-join."""
    from bodo_spark.operators.dedup import (_band_sig_cols,
                                            minhash_signatures,
                                            unpersist_cached)
    sig = minhash_signatures(df)
    banded = sig.select("id", F.explode(F.array(*_band_sig_cols(16, 8)))
                        .alias("band_sig"))
    n = (banded.groupBy("band_sig").agg(F.count(F.lit(1)).alias("c"))
         .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("n"))
         .collect()[0]["n"])
    unpersist_cached()
    return int(n or 0)


def _timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main_mega_span(sf: str, sizes: list[int]) -> None:
    """Hot-gram probe for duplicate_span_positions: plant a fixed
    60-token boilerplate block into c docs (unique pre/suffix tokens so
    doc-level collapse can't absorb it); every positional 50-gram of the
    block occurs c times corpus-wide."""
    from bodo_spark.operators import dedup as D
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_span_skew")
    base = _corpus(spark, sf).persist()
    n_base = base.count()
    block = " ".join(f"boiler{i}" for i in range(60))
    print(json.dumps({"corpus": n_base, "mode": "mega-span"}), flush=True)
    for c in sizes:
        start = 10_000_000
        mega = (spark.range(start, start + c)
                .select(F.col("id").alias("doc_id"),
                        F.concat(F.lit("pre"), F.col("id").cast("string"),
                                 F.lit(" " + block + " post"),
                                 F.col("id").cast("string"))
                        .alias("text")))
        planted = base.union(mega).persist()
        planted.count()
        out, sec = _timed(lambda: D.excise_duplicate_spans(
            planted, span=50).write.format("noop")
            .mode("overwrite").save())
        # content pin: the canonical (lowest-id) copy keeps the block,
        # every other planted doc is reduced to its unique pre/post
        # tokens -- checked on a 3-doc sample, not a second full pass
        sample = (D.excise_duplicate_spans(planted, span=50)
                  .where(F.col("doc_id").isin(start, start + 1,
                                              start + c - 1))
                  .collect())
        D.unpersist_cached()
        by_id = {r["doc_id"]: r["text"] for r in sample}
        ok = (block in by_id[start]
              and all(block not in by_id[i] and f"pre{i}" in by_id[i]
                      for i in (start + 1, start + c - 1)))
        planted.unpersist()
        print(json.dumps({"c": c, "excise_sec": sec,
                          "content_pinned": ok}), flush=True)
    spark.stop()


def main() -> None:
    sf = sys.argv[1]
    args = sys.argv[2:]
    if args and args[0] == "--mega-span":
        sizes = [int(a) for a in args[1:]] or [2_000, 20_000, 100_000]
        main_mega_span(sf, sizes)
        return
    sizes = [int(a) for a in args] or [2_000, 8_000, 32_000]
    # naive candidates = 8 * c(c-1)/2; at c=10k that is already 4e8
    # joined rows through dropDuplicates -- beyond this the naive run
    # is reported analytically, not executed
    naive_max = 10_000
    from bodo_spark.operators import dedup as D
    from bodo_spark.session import get_spark
    spark = get_spark(app_name="probe_lsh_skew")
    base = _corpus(spark, sf).persist()
    n_base = base.count()

    # unplanted baselines
    base_pairs, t = _timed(lambda: set(
        map(tuple, D.minhash_lsh_pairs(base, threshold=0.5)
            .select("id_a", "id_b").collect())))
    D.unpersist_cached()
    print(json.dumps({"corpus": n_base, "baseline_pairs": len(base_pairs),
                      "baseline_sec": t}), flush=True)
    base_surv, t = _timed(lambda: set(
        r["doc_id"] for r in D.near_dup_survivors(base, threshold=0.5)
        .select("doc_id").collect()))
    D.unpersist_cached()
    print(json.dumps({"baseline_survivors": len(base_surv),
                      "survivors_sec": t}), flush=True)

    for c in sizes:
        row: dict = {"c": c}

        # --- byte-identical mega-cluster
        ident = _planted(spark, base, c, identical=True).persist()
        ident.count()
        row["cand_naive"], _ = _timed(lambda: _candidates(ident))
        if c <= naive_max:
            _, row["naive_sec"] = _timed(
                lambda: D.minhash_lsh_pairs(ident, threshold=0.5)
                .write.format("noop").mode("overwrite").save())
            D.unpersist_cached()
        surv, row["collapse_sec"] = _timed(lambda: set(
            r["doc_id"] for r in
            D.near_dup_survivors(ident, threshold=0.5)
            .select("doc_id").collect()))
        D.unpersist_cached()
        # zero recall loss: survivors = baseline survivors + the one
        # cluster representative (min planted id)
        row["collapse_exact_recall"] = (
            surv == base_surv | {10_000_000})
        ident.unpersist()

        # --- near-identical cluster: cap is the only guard
        near = _planted(spark, base, c, identical=False).persist()
        near.count()
        row["cand_near_naive"], _ = _timed(lambda: _candidates(near))
        capped, row["capped_sec"] = _timed(lambda: set(
            map(tuple,
                D.minhash_lsh_pairs(near, threshold=0.5,
                                    max_band_occupancy=64)
                .select("id_a", "id_b").collect())))
        D.unpersist_cached()
        outside = {(a, b) for a, b in capped
                   if a < 10_000_000 and b < 10_000_000}
        row["capped_outside_pairs_identical"] = outside == base_pairs
        near.unpersist()
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
