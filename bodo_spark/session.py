"""SparkSession factory tuned for the engine.

The reference (bodo-ai/Bodo) runs a spawner + MPI-worker process model with
per-operator memory budgets and spillable buffer pools
(see reference bodo/spawn/spawner.py:134, bodo/libs/_memory_budget.h:126).
In Spark all of that is native: driver/executors, UnifiedMemoryManager,
spill-aware shuffle. The only thing we own is session configuration --
chosen for large-cluster posture (AQE, broadcast, bloom joins, skew
handling) while remaining correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that matter at 100 TB and are harmless locally:
# - AQE: runtime coalescing, skew-join splitting, dynamic broadcast.
# - Bloom-filter joins: the Spark-native equivalent of the reference's
#   "runtime join filters" (bodo/pandas/optimizer/runtime_join_filter.cpp).
# - Nested schema pruning: struct sub-field trimming (BodoRelFieldTrimmer).
# - Arrow: fast pandas interchange for the UDF slow path.
_ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Shuffles START wide and AQE coalesces down to the advisory size:
    # the static shuffle.partitions=32 below is only the post-coalesce
    # floor for tiny inputs. Without this, partition width grows
    # linearly with data (32 partitions x 180M-row lineitem at the
    # 300x probe = multi-GB tasks): measured -24%/-29% on q18/q21 at
    # sf30-equivalent, zero cost at sf0.1 (AQE coalesces 256 -> few
    # before tasks launch). On a real 1000-executor cluster raise it
    # (or call plans.tune_shuffle_partitions from input bytes).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    # AQE inside cached plans: by default Spark pins a persisted frame's
    # output partitioning (canChangeCachedPlanOutputPartitioning=false),
    # so a cache fed by a 256-partition shuffle (initialPartitionNum
    # above) materializes 256 tiny blocks and EVERY consumer launches
    # 256 scan tasks with per-task overhead dwarfing the work. Allowing
    # AQE to re-optimize under the cache coalesces those to size-based
    # partitions exactly like any other shuffle (guide: fewer, larger
    # partitions). Measured on the persisted-postings BM25 ranker at
    # sf0.1: 4 consumer stages x 256 tasks -> a handful; 12-30 s wall
    # -> 3-9 s. Value-neutral: partitioning only, results unchanged.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Partition discovery: below this many paths the driver lists
    # directories itself; above it Spark launches a DISTRIBUTED listing
    # job (one task per dir). The default (32) turns every read of a
    # bucketed/cell-partitioned table here (256 bucket dirs, 8+ cell
    # dirs x stores) into a 256-task listing job costing ~0.5-1 s per
    # spark.read.parquet call -- and the lakehouse gates construct such
    # readers 5-15x per query (measured: construct 0.65-1.1 s -> 0.17 s
    # at 256 dirs). Engine layouts bound partition dirs (n_buckets /
    # n_cells <= 4096 by the merge/mor/store contracts), and listing
    # 4096 local/posix dirs on the driver is single-digit ms; on an
    # object store with very wide tables, lower it back toward the
    # default.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "4096",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Default creationSideThreshold (10MB) silently disables bloom
    # pruning exactly where it pays most: a dimension join whose build
    # side just outgrew the broadcast threshold (q9's 12.5%-selective
    # part filter is ~2.5M keys at the 1000x probe -- the bloom itself
    # is a few MB regardless). 128m re-arms it for that band; measured
    # q9 28.7/24.2 -> 19.0/15.0 s at sf100 (A/B both orders, warm).
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "128MB",
    # NOTE: runtimeFilter.semiJoinReduction=true hangs the Spark 4.1.2
    # planner (py4j spin even on a plain scan+agg) -- bloom filters above
    # give the runtime-join-filter benefit without it.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # test data stores TIMESTAMP(NANOS); Spark 4 has no nanos timestamp --
    # read as long and convert in the scan layer (values are us-aligned).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # 24m, not bigger: a borderline build side (the 300x probe's 4.5M-row
    # customer at ~70 MB serialized) explodes to several hundred MB of
    # JVM hash relation -- q5 ran 20-76 s with high GC variance at 64m
    # vs a stable 13.5 s once customer shuffled instead. AQE still
    # broadcasts genuinely-small sides from MEASURED shuffle sizes, so
    # small-SF plans keep their broadcasts (three-way A/B at sf0.1:
    # 24m fastest).
    "spark.sql.autoBroadcastJoinThreshold": "24m",
    # pandas semantics: no silent int overflow surprises in ansi mode off,
    # keep legacy permissive casts (reference follows Snowflake/pandas, not ANSI).
    "spark.sql.ansi.enabled": "false",
}


def engine_confs() -> dict[str, str]:
    """The conf set every session created by this engine should carry."""
    return dict(_ENGINE_CONFS)


def get_spark(app_name: str = "bodo_spark", master: str | None = None) -> SparkSession:
    """Return (create if needed) the engine's SparkSession.

    On a real cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS or *]``.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_confs(active)
        return active

    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
        if master.startswith("local"):
            # single-JVM: driver memory is the only knob; match container.
            builder = builder.config("spark.driver.memory",
                                     os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
            builder = builder.config("spark.sql.shuffle.partitions", "32")
            # Containers without libhadoop.so pay a /bin/chmod process
            # fork per partition directory created (RawLocalFileSystem.
            # setPermission falls back to Shell.execCommand) -- the
            # dominant cost of every hive-partitioned publish here
            # (bucketed MoR/merge tables, cell-partitioned ANN stores).
            # bodo-localfs.jar overrides setPermission with the java.nio
            # equivalent; no-op change on clusters with the native lib.
            jar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "jvm", "bodo-localfs.jar")
            if os.path.exists(jar):
                builder = builder.config("spark.driver.extraClassPath", jar)
                builder = builder.config(
                    "spark.hadoop.fs.file.impl",
                    "bodospark.fs.FastLocalFileSystem")
                # the FileContext route (streaming checkpoint manager)
                # resolves file:// separately
                builder = builder.config(
                    "spark.hadoop.fs.AbstractFileSystem.file.impl",
                    "bodospark.fs.FastLocalFileSystem$FastLocalFs")
    for k, v in _ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _apply_runtime_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable subset to a session we did not create."""
    for k, v in _ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session; keep going
