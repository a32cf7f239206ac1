"""Format-I/O battery under the correctness gate: CSV, JSON(-lines with
nested structs), JDBC (embedded Derby, partitioned read), from_pandas
(Arrow in-memory scan) and DDL/CTAS passthrough. Each query ROUND-TRIPS
data through the format (write -> read back -> aggregate) so the driver
hash-checks the whole encode/decode path, not just the reader; the
oracles state the same aggregate straight off the source parquet --
any value drift means the format sink or scan corrupted rows.

Staging discipline: CSV/JSON/CTAS stage under uuid-suffixed /tmp dirs,
MATERIALIZE the (tiny) aggregate, then remove the staging dir before
returning -- no litter, and concurrent gate runs cannot collide. The
Derby database is the one fixed-path exception (embedded Derby holds
the db open for the JVM's lifetime, so rmtree underneath it is unsafe);
it is bounded (one small db per sf tag) and the table is overwritten
per run, with the aggregate likewise materialized before return.

Reference parity: bodo/pandas/base.py:392 (read_csv), bodo/ir/json_ext.py
(read_json/to_json), bodo/ir/sql_ext.py:140 (partitioned SQL fetch),
bodo/pandas/base.py:74 (from_pandas), BodoSQL/bodosql/ddl_ext.py:17
(execute_ddl / CTAS).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import QueryDef, dec, tbl
from ..rowframe import local_df


def _tag(sf: str) -> str:
    return os.path.basename(sf.rstrip("/")).replace(".", "_")


def _materialize(df: DataFrame, schema: str) -> DataFrame:
    """Collect a TINY aggregate and rewrap it, so the returned frame no
    longer depends on staging files the caller is about to delete."""
    rows = [tuple(r) for r in df.collect()]
    return local_df(df.sparkSession, rows, schema)


def io_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """supplier -> CSV (RFC-4180 quoting, header) -> read back with an
    explicit schema (no inference: schema drift would surface as a
    hash mismatch, not a silent cast) -> per-nation aggregate. The
    decimal(12,2) balance survives text round-trip exactly; the name
    checksum catches quoting/escaping corruption."""
    from ..sources.io import read_csv, to_csv

    sup = tbl(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey",
        dec("s_acctbal", 12, 2).alias("bal"))
    stage = f"/tmp/bodo_spark_csv_{uuid.uuid4().hex[:8]}"
    try:
        to_csv(sup, stage)
        back = read_csv(
            stage,
            schema="s_suppkey bigint, s_name string, s_nationkey bigint, "
                   "bal decimal(12,2)",
            infer_schema=False, spark=spark)
        agg = (back.groupBy("s_nationkey")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("bal").cast("double").alias("sum_bal"),
                    F.sum(F.length("s_name")).cast("bigint")
                    .alias("sum_name_len"))
               .orderBy("s_nationkey"))
        return _materialize(
            agg, "s_nationkey bigint, n bigint, sum_bal double, "
                 "sum_name_len bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_IO_CSV_SQL = """
SELECT s_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
       CAST(SUM(length(s_name)) AS BIGINT) AS sum_name_len
FROM supplier GROUP BY 1 ORDER BY 1
"""


def io_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """events -> JSON-lines with a NESTED struct column -> read back
    with an explicit schema -> aggregate over both the flat and the
    nested field (flat and nested sums must agree with each other and
    with the source)."""
    from ..sources.io import read_json, to_json

    e = (tbl(spark, sf, "events")
         .select("event_id", "event_type", dec("value", 12, 2).alias("val"))
         .withColumn("meta", F.struct(F.col("event_type").alias("t"),
                                      F.col("val").alias("v"))))
    stage = f"/tmp/bodo_spark_json_{uuid.uuid4().hex[:8]}"
    try:
        to_json(e, stage)
        back = read_json(
            stage,
            schema="event_id bigint, event_type string, val decimal(12,2), "
                   "meta struct<t:string,v:decimal(12,2)>",
            spark=spark)
        agg = (back.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("val").cast("double").alias("sum_val"),
                    F.sum("meta.v").cast("double").alias("sum_nested_val"),
                    F.sum((F.col("meta.t") == F.col("event_type"))
                          .cast("bigint")).alias("n_nested_match"))
               .orderBy("event_type"))
        return _materialize(
            agg, "event_type string, n bigint, sum_val double, "
                 "sum_nested_val double, n_nested_match bigint")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_IO_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_nested_val,
       COUNT(*) AS n_nested_match
FROM events GROUP BY 1 ORDER BY 1
"""


def io_jdbc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """customer -> JDBC sink (embedded Derby, the JDBC engine Spark
    itself ships) -> PARTITIONED JDBC read (partitionColumn/bounds/
    numPartitions=4, the reference's distributed batch-fetch shape,
    bodo/ir/sql_ext.py:140) -> per-segment aggregate. Bounds come from
    one bounded driver-side scalar aggregate (standard discovery
    pattern). DECIMAL(12,2) survives the SQL type system exactly.
    Fixed db path per sf (see module docstring); table overwritten and
    the aggregate materialized before return."""
    from ..sources.io import read_sql, to_sql

    tag = _tag(sf)
    url = f"jdbc:derby:/tmp/bodo_spark_derby_{tag}/db;create=true"
    c = tbl(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", dec("c_acctbal", 12, 2).alias("bal"))
    to_sql(c, "gate_cust", url, mode="overwrite")
    hi = c.agg(F.max("c_custkey")).collect()[0][0]  # bounded scalar
    back = read_sql("gate_cust", url, spark=spark,
                    partition_column="c_custkey", lower_bound=0,
                    upper_bound=int(hi) + 1, num_partitions=4)
    agg = (back.groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("bal").cast("double").alias("sum_bal"))
           .orderBy("c_mktsegment"))
    return _materialize(agg, "c_mktsegment string, n bigint, sum_bal double")


_IO_JDBC_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY 1 ORDER BY 1
"""


def io_from_pandas_stats(spark: SparkSession, sf: str) -> DataFrame:
    """from_pandas (Arrow-backed createDataFrame, reference
    base.py:74): nation and region enter as ACTUAL pandas frames
    (pandas.read_parquet), are scattered to Spark, joined and
    aggregated -- the in-memory-scan path with a real oracle."""
    import pandas as pd

    from ..sources.io import from_pandas

    nat = from_pandas(
        pd.read_parquet(os.path.join(sf, "nation.parquet")), spark=spark)
    reg = from_pandas(
        pd.read_parquet(os.path.join(sf, "region.parquet")), spark=spark)
    return (nat.join(F.broadcast(reg),
                     nat["n_regionkey"] == reg["r_regionkey"])
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.min("n_name").alias("first_nation"))
            .orderBy("r_name"))


_IO_FROM_PANDAS_SQL = """
SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
"""


def sql_ddl_ctas_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """DDL/CTAS passthrough (reference ddl_ext.py:17 execute_ddl,
    IcebergDDLExecutor CTAS): DROP + CREATE TABLE AS SELECT through
    BodoSQLContext.execute_ddl into an external parquet location, then
    query the CATALOG TABLE (not the source view) back through .sql().
    The oracle restates the CTAS subquery's aggregate off orders.
    uuid-suffixed table name + location, dropped after materializing."""
    from ..sql.context import BodoSQLContext

    run = uuid.uuid4().hex[:8]
    loc = f"/tmp/bodo_spark_ctas_{run}"
    name = f"gate_ctas_{run}"
    bc = BodoSQLContext({"ord_src": tbl(spark, sf, "orders")}, spark=spark)
    try:
        bc.execute_ddl(f"""
            CREATE TABLE {name} USING PARQUET LOCATION '{loc}' AS
            SELECT o_orderkey, o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS price
            FROM ord_src WHERE o_orderkey % 4 = 0""")
        agg = bc.sql(f"""
            SELECT o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(price) AS DOUBLE) AS sum_price
            FROM {name} GROUP BY 1 ORDER BY 1""").spark
        return _materialize(
            agg, "o_orderpriority string, n bigint, sum_price double")
    finally:
        bc.execute_ddl(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)


_SQL_CTAS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 4 = 0
GROUP BY 1 ORDER BY 1
"""


def io_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """orders -> ORC (hive-partitioned by o_orderpriority) -> read back
    -> aggregate. Binary-columnar round-trip: decimals, dates (as
    formatted strings) and partition-column recovery all survive; the
    oracle aggregates the same rows straight from parquet, so any ORC
    writer/reader drift surfaces as a value mismatch."""
    from ..sources.io import read_orc, to_orc

    o = tbl(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        dec("o_totalprice", 12, 2).alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"))
    stage = f"/tmp/bodo_spark_orc_{uuid.uuid4().hex[:8]}"
    try:
        to_orc(o, stage, partition_by=["o_orderpriority"])
        back = read_orc(stage, spark=spark)
        agg = (back.groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("price").cast("double").alias("sum_price"),
                    F.min("od").alias("min_date"),
                    F.max("od").alias("max_date"))
               .orderBy("o_orderpriority"))
        return _materialize(
            agg, "o_orderpriority string, n bigint, sum_price double, "
                 "min_date string, max_date string")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_IO_ORC_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_price,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
FROM orders GROUP BY 1 ORDER BY 1
"""


def io_binary_files(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-media ingest (sources/io.read_binary_files): the first 20
    documents are staged as .bin files (plus a decoy the glob must
    exclude at LISTING time), ingested through Spark's binaryFile
    source, ids recovered from paths, and the bytes md5-pinned per
    lang against the oracle hashing the same text straight from
    parquet -- any content corruption, truncation or glob leak
    surfaces as a value mismatch."""
    from ..sources.io import read_binary_files

    d = tbl(spark, sf, "documents")
    rows = d.where(F.col("doc_id") < 20).select("doc_id", "text").collect()
    stage = f"/tmp/bodo_spark_bin_{uuid.uuid4().hex[:8]}"
    os.makedirs(stage)
    try:
        for r in rows:
            with open(f"{stage}/doc_{r['doc_id']:05d}.bin", "wb") as fh:
                fh.write(r["text"].encode("utf-8"))
        with open(f"{stage}/ignore.tmp", "wb") as fh:
            fh.write(b"decoy")
        b = read_binary_files(stage, spark=spark, glob="*.bin")
        parsed = b.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("bigint").alias("doc_id"),
            F.col("length"), F.md5("content").alias("h"))
        agg = (parsed.join(d.select("doc_id", "lang"), "doc_id")
               .groupBy("lang").agg(
                   F.count(F.lit(1)).alias("n_files"),
                   F.sum("length").cast("bigint").alias("sum_bytes"),
                   F.md5(F.array_join(F.array_sort(F.collect_list("h")),
                                      "")).alias("content_hash"))
               .orderBy("lang"))
        return _materialize(
            agg, "lang string, n_files bigint, sum_bytes bigint, "
                 "content_hash string")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_IO_BINARY_SQL = """
SELECT lang, COUNT(*) AS n_files,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
       md5(string_agg(md5(text), '' ORDER BY md5(text))) AS content_hash
FROM documents WHERE doc_id < 20
GROUP BY lang ORDER BY lang
"""


QUERIES: dict[str, QueryDef] = {
    "io_binary_files": QueryDef(io_binary_files, _IO_BINARY_SQL),
    "io_orc_roundtrip": QueryDef(io_orc_roundtrip, _IO_ORC_SQL),
    "io_csv_roundtrip": QueryDef(io_csv_roundtrip, _IO_CSV_SQL),
    "io_json_roundtrip": QueryDef(io_json_roundtrip, _IO_JSON_SQL),
    "io_jdbc_roundtrip": QueryDef(io_jdbc_roundtrip, _IO_JDBC_SQL),
    "io_from_pandas_stats": QueryDef(io_from_pandas_stats,
                                     _IO_FROM_PANDAS_SQL),
    "sql_ddl_ctas_roundtrip": QueryDef(sql_ddl_ctas_roundtrip,
                                       _SQL_CTAS_SQL),
}
