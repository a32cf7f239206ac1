"""Plan introspection + tuning helpers.

The reference exposes its plan through generate_plan/explain on the
Calcite side (BodoSQL context.py) and sizes its execution with
per-operator memory budgets (bodo/libs/_memory_budget.h). Spark-side,
the plan is Catalyst's and the budget is the shuffle layout; this
module gives both a programmatic surface:

- summarize(df): scan/exchange/reuse/codegen counts + pushed filters,
  the facts every scale review of a plan starts from.
- assert_scaling(df, ...): guardrail form of the same (used by tests).
- tune_shuffle_partitions(spark, input_bytes): partition count so each
  shuffle partition lands near a target size -- the knob that decides
  spill-vs-parallelism at 100 TB.
- ensure_scan_width(df): widen under-partitioned inputs ahead of
  row-proportional stages (Python UDFs, pair scoring); no-op on real
  multi-file inputs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PlanSummary:
    scans: int = 0
    scan_tables: list[str] = field(default_factory=list)
    exchanges: int = 0
    reused_exchanges: int = 0
    broadcasts: int = 0
    sort_merge_joins: int = 0
    broadcast_hash_joins: int = 0
    wholestage_codegen: int = 0
    python_evals: int = 0
    pushed_filters: list[str] = field(default_factory=list)


def summarize(df: DataFrame, executed: bool = True) -> PlanSummary:
    """Counts of the plan features that matter at scale, from the
    physical plan (post-EnsureRequirements; AQE-finalized once the frame
    has executed). ``executed`` is kept for call-site clarity -- before
    an action both forms read the same initial adaptive plan."""
    del executed
    p = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections; keep only the final one or every
    # count doubles
    p = p.split("== Initial Plan ==")[0]
    s = PlanSummary()
    s.scans = p.count("FileScan parquet")
    s.scan_tables = sorted({m.group(1) for m in
                            re.finditer(r"FileScan parquet \[(\w+?)#", p)})
    s.exchanges = p.count("Exchange ")
    s.reused_exchanges = p.count("ReusedExchange") + p.count("ReusedQueryStage")
    s.broadcasts = p.count("BroadcastExchange")
    s.sort_merge_joins = p.count("SortMergeJoin")
    s.broadcast_hash_joins = p.count("BroadcastHashJoin")
    s.wholestage_codegen = p.count("WholeStageCodegen") \
        or len(set(re.findall(r"\*\((\d+)\)", p)))
    s.python_evals = (p.count("ArrowEvalPython") + p.count("BatchEvalPython")
                      + p.count("MapInPandas") + p.count("FlatMapGroupsInPandas"))
    s.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    return s


def assert_scaling(df: DataFrame, max_exchanges: int | None = None,
                   require_pushdown: bool = False,
                   forbid_python: bool = False) -> PlanSummary:
    """Raise AssertionError when the plan violates the stated scale
    budget; returns the summary for further checks."""
    s = summarize(df, executed=False)
    if max_exchanges is not None and s.exchanges > max_exchanges:
        raise AssertionError(
            f"plan has {s.exchanges} exchanges (budget {max_exchanges})")
    if require_pushdown and not any(f.strip() for f in s.pushed_filters):
        raise AssertionError("no PushedFilters reached any scan")
    if forbid_python and s.python_evals:
        raise AssertionError(
            f"{s.python_evals} Python eval nodes in a JVM-only plan")
    return s


def ensure_scan_width(df: "DataFrame",
                      bytes_per_partition: int | None = 1 << 20) -> "DataFrame":
    """Round-robin widen a frame whose partition count is below cluster
    width. Use before stages whose work is proportional to ROWS (Python
    UDF batches, per-row decode, pair scoring), not bytes: a compact
    input (one ~50 MB parquet file = one scan split) would otherwise
    run the whole stage on one core (the SCALE.md round-7 lesson). On a
    genuinely large input (>= defaultParallelism partitions -- any real
    multi-file corpus) this is a NO-OP: no shuffle is added at 100 TB,
    where repartitioning would be pure waste.

    Work-aware cap (round 8): widening is bounded by the Catalyst size
    estimate -- at most ceil(sizeInBytes / bytes_per_partition)
    partitions. A sub-MB input (the sf0.1 ANN corpus) keeps its narrow
    scan instead of paying 32-44 tasks of pure scheduling overhead
    (BENCH_r07 regression: ann_cosine 0.94 -> 1.23 s), while anything
    >= width * bytes_per_partition still widens to full cluster width
    (the 300x probe's 240 MB corpus is unaffected). When the estimate
    is unavailable -- or ``bytes_per_partition=None`` (per-row cost
    unrelated to bytes, e.g. remote LLM calls where width = request
    concurrency) -- widen unconditionally, the safe-at-scale default."""
    import math

    width = df.sparkSession.sparkContext.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if cur >= width:
        return df
    target = width
    if bytes_per_partition:
        try:
            est = df._jdf.queryExecution().optimizedPlan() \
                .stats().sizeInBytes()
            est = int(est if isinstance(est, int) else est.longValue())
            target = min(width, max(1, math.ceil(est / bytes_per_partition)))
        except Exception:
            target = width  # no estimate -> legacy full widening
    if target <= cur:
        return df
    return df.repartition(target)


def tune_shuffle_partitions(spark: SparkSession, input_bytes: int,
                            target_partition_mb: int = 128,
                            floor: int | None = None) -> int:
    """Set spark.sql.shuffle.partitions so a full shuffle of
    ``input_bytes`` lands ~``target_partition_mb`` per partition
    (clamped below by cluster parallelism). Returns the chosen count."""
    floor = floor or spark.sparkContext.defaultParallelism
    n = max(floor, input_bytes // (target_partition_mb * 1024 * 1024))
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    return int(n)
