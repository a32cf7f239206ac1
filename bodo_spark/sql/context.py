"""BodoSQLContext equivalent: temp-view registration + dialect shims.

Reference: BodoSQL/bodosql/context.py:504 (bc.sql), py4j_gateway.py
(Calcite hop -- not needed: Catalyst is the planner), BodoRules.kt
MinRowNumberFilterRule (QUALIFY), FunctionExpander.java (UDF inlining
-> Spark SQL UDFs).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession

from ..session import get_spark

# Snowflake-dialect functions Spark lacks (or names differently),
# registered as SQL UDFs (pure SQL bodies -> inlined by Catalyst, no
# Python round trip; reference BodoSQL operatorTables/*.java surface).
_SNOWFLAKE_FNS: dict[str, str] = {
    "IFF": "(c BOOLEAN, a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN CASE WHEN c THEN a ELSE b END",
    "DIV0": "(x DOUBLE, y DOUBLE) RETURNS DOUBLE RETURN CASE WHEN y = 0 THEN 0 ELSE x / y END",
    "DIV0NULL": "(x DOUBLE, y DOUBLE) RETURNS DOUBLE RETURN CASE WHEN y = 0 OR y IS NULL THEN 0 ELSE x / y END",
    "SQUARE": "(x DOUBLE) RETURNS DOUBLE RETURN x * x",
    "EDITDISTANCE": "(a STRING, b STRING) RETURNS INT RETURN levenshtein(a, b)",
    "STRTOK": "(s STRING, delim STRING, part INT) RETURNS STRING RETURN split_part(s, delim, part)",
    "SPLIT_TO_ARRAY": "(s STRING, delim STRING) RETURNS ARRAY<STRING> RETURN split(s, delim)",
    "DATE_FROM_PARTS": "(y INT, m INT, d INT) RETURNS DATE RETURN make_date(y, m, d)",
    "TIME_FROM_PARTS": "(h INT, m INT, s INT) RETURNS TIMESTAMP RETURN make_timestamp(1970, 1, 1, h, m, s)",
    # NOTE: Spark builtins shadow temp functions, so Snowflake names whose
    # Spark builtin has a different arity (TO_NUMBER/TRY_TO_NUMBER/
    # TO_VARCHAR/TO_BOOLEAN) cannot be shimmed -- callers use CAST/
    # TRY_CAST; regexp_substr/to_number(s,fmt) exist natively in Spark 4.
    "SQUARE_ROOT": "(x DOUBLE) RETURNS DOUBLE RETURN sqrt(x)",
    "TRY_TO_DOUBLE": "(s STRING) RETURNS DOUBLE RETURN TRY_CAST(s AS DOUBLE)",
    "JAROWINKLER_SIMILARITY": (
        "(a STRING, b STRING) RETURNS INT RETURN "
        "CAST(round(100 * (1 - CAST(levenshtein(a, b) AS DOUBLE) / "
        "greatest(length(a), length(b), 1))) AS INT)"),  # bounded approx
    "OBJECT_CONSTRUCT2": (
        "(k1 STRING, v1 STRING, k2 STRING, v2 STRING) RETURNS MAP<STRING,STRING> "
        "RETURN map(k1, v1, k2, v2)"),
    "CONDITIONAL_TRUE_EVENT_PREP": "(c BOOLEAN) RETURNS INT RETURN CASE WHEN c THEN 1 ELSE 0 END",
}

def _find_top_level(query: str, pattern: re.Pattern, start: int = 0):
    """First match of ``pattern`` at paren-depth 0 outside quotes."""
    depth = 0
    i = start
    n = len(query)
    while i < n:
        ch = query[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch in ("'", '"'):
            j = query.find(ch, i + 1)
            i = (j if j != -1 else n)
        elif depth == 0:
            m = pattern.match(query, i)
            if m:
                return m
        i += 1
    return None


_QUALIFY_RE = re.compile(r"QUALIFY\b", re.IGNORECASE)
_TAIL_RE = re.compile(r"(ORDER\s+BY|LIMIT)\b", re.IGNORECASE)
_FROM_RE = re.compile(r"FROM\b", re.IGNORECASE)
_SELECT_RE = re.compile(r"\s*SELECT\b", re.IGNORECASE)


def desugar_qualify(query: str) -> str:
    """Rewrite `SELECT <sel> FROM <src> QUALIFY <pred> [tail]` into

        SELECT <sel> FROM (
            SELECT *, (<pred>) AS __qualify__ FROM <src>
        ) __q WHERE __qualify__  [tail]

    Window expressions in <pred> are evaluated in the inner scope over
    the full (post-WHERE) rows -- Snowflake QUALIFY semantics, the same
    plan shape as the reference's MinRowNumberFilter. The predicate may
    reference source columns that are not in the select list. Handles
    the top-level query; one QUALIFY per level (the dialect's actual
    usage).
    """
    m = _find_top_level(query, _QUALIFY_RE)
    if m is None:
        return query
    head, rest = query[:m.start()], query[m.end():]
    tail_m = _find_top_level(rest, _TAIL_RE)
    if tail_m:
        pred, tail = rest[:tail_m.start()], rest[tail_m.start():]
    else:
        pred, tail = rest, ""
    pred = pred.strip().rstrip(";")

    sel_m = _SELECT_RE.match(head)
    from_m = _find_top_level(head, _FROM_RE, sel_m.end() if sel_m else 0)
    if sel_m is None or from_m is None:
        # unexpected shape: fall back to filtering the projected result
        return (f"SELECT * EXCEPT (__qualify__) FROM (SELECT q.*, ({pred}) "
                f"AS __qualify__ FROM ({head.rstrip()}) q) WHERE __qualify__ {tail}")
    sel_list = head[sel_m.end():from_m.start()].strip()
    src = head[from_m.start():].rstrip()
    return (f"SELECT {sel_list} FROM (SELECT *, ({pred}) AS __qualify__ "
            f"{src}) __q WHERE __qualify__ {tail}")


def register_snowflake_fns(spark: SparkSession) -> None:
    """Create the dialect shim functions (idempotent)."""
    for name, body in _SNOWFLAKE_FNS.items():
        try:
            spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
        except Exception:
            pass  # older Spark without SQL UDFs: shims unavailable


class BodoSQLContext:
    """reference BodoSQL/bodosql/context.py: tables registered once,
    .sql() plans through Catalyst with dialect shims applied."""

    def __init__(self, tables: Mapping[str, Any] | None = None,
                 spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        register_snowflake_fns(self.spark)
        self._tables: dict[str, SparkDF] = {}
        for name, t in (tables or {}).items():
            self.add_table(name, t)

    def add_table(self, name: str, table: Any) -> None:
        from ..frame import BodoDataFrame
        if isinstance(table, BodoDataFrame):
            df = table.spark
        elif isinstance(table, SparkDF):
            df = table
        elif isinstance(table, pd.DataFrame):
            df = self.spark.createDataFrame(table)
        elif isinstance(table, str):  # path -> parquet scan (TablePath)
            df = self.spark.read.parquet(table)
        else:
            raise TypeError(f"cannot register {type(table)}")
        df.createOrReplaceTempView(name)
        self._tables[name] = df

    def sql(self, query: str):
        from ..frame import BodoDataFrame
        return BodoDataFrame(self.spark.sql(desugar_qualify(query)))

    def remove_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._tables.pop(name, None)
