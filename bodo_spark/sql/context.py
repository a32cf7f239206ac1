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

# Dialect kernel surface lives in bodo_spark.functions.snowflake
# (reference BodoSQL/bodosql/kernels/); re-exported here for callers.
from ..functions.snowflake import (  # noqa: F401
    SNOWFLAKE_SQL_FNS as _SNOWFLAKE_FNS,
    register_snowflake_fns,
)

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


_GENERATOR_RE = re.compile(
    r"(?:LATERAL\s+)?TABLE\s*\(\s*GENERATOR\s*\(\s*ROWCOUNT\s*=>\s*(\d+)"
    r"\s*\)\s*\)", re.IGNORECASE)


def _sub_outside_quotes(pattern: re.Pattern, repl, query: str) -> str:
    """re.sub that never rewrites inside '…'/"…" literals -- a naive
    whole-text sub would corrupt literal data that happens to match
    (e.g. an email containing @param)."""
    out = []
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch in ("'", '"'):
            # scan for the real terminator: skip backslash-escaped quotes
            # ('it\'s') and doubled quotes ('it''s') so the in/out-of-
            # literal state never inverts mid-query
            j = i + 1
            while j < n:
                if query[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if query[j] == ch:
                    if j + 1 < n and query[j + 1] == ch:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            j = min(j, n - 1)
            out.append(query[i:j + 1])
            i = j + 1
            continue
        m = pattern.match(query, i)
        if m:
            out.append(repl(m) if callable(repl) else repl)
            i = m.end()
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _rewrite_generator(query: str) -> str:
    """Snowflake's row-generator table function (reference BodoSQL
    test_lateral.py GENERATOR tests) -> Spark's range() table-valued
    function: TABLE(GENERATOR(ROWCOUNT => n)) becomes range(n), a
    distributed n-row relation with an ``id`` column (SEQ4 analogue)."""
    return _sub_outside_quotes(_GENERATOR_RE,
                               lambda m: f"range({m.group(1)})", query)


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

    def sql(self, query: str, params: Mapping[str, Any] | None = None):
        """Run a query (reference BodoSQLContext.sql, context.py:504).

        ``params`` binds Snowflake-style named parameters (``@name`` in
        the text; reference named_params_dict) -- values go through
        Spark's parameterized-SQL binding (:name), never string
        interpolation, so injection-shaped strings stay literals."""
        from ..frame import BodoDataFrame
        q = _rewrite_generator(desugar_qualify(query))
        if params:
            for name in params:
                pat = re.compile(f"@{re.escape(name)}\\b")
                q = _sub_outside_quotes(pat, f":{name}", q)
            return BodoDataFrame(self.spark.sql(q, args=dict(params)))
        return BodoDataFrame(self.spark.sql(q))

    def remove_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._tables.pop(name, None)

    # reference public-API names (BodoSQL/bodosql/context.py
    # add_or_replace_view/remove_view/convert_to_pandas/generate_plan/
    # validate_query/execute_ddl)
    add_or_replace_view = add_table
    remove_view = remove_table

    def convert_to_pandas(self, query: str) -> pd.DataFrame:
        """Run and materialize (reference convert_to_pandas returns the
        generated code; on Spark the plan IS the artifact, so this
        returns the result)."""
        return self.sql(query).to_pandas()

    def generate_plan(self, query: str, mode: str = "formatted") -> str:
        """The optimized physical plan for a query (reference
        generate_plan returns the Calcite plan string)."""
        df = self.spark.sql(desugar_qualify(query))
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString(mode))

    def validate_query(self, query: str) -> bool:
        """Analyze (resolve names/types) without executing; raises on an
        invalid query, True otherwise."""
        self.spark.sql(desugar_qualify(query)).schema
        return True

    def validate_query_compiles(self, query: str,
                                params_dict: Mapping[str, Any] | None = None,
                                dynamic_params_list=None) -> bool:
        """reference context.py:198: validate that the query plans all
        the way through (Calcite codegen there; Catalyst analysis +
        physical planning here), with named params bound."""
        del dynamic_params_list  # positional ? params: not supported
        q = _rewrite_generator(desugar_qualify(query))
        if params_dict:
            for name in params_dict:
                pat = re.compile(f"@{re.escape(name)}\\b")
                q = _sub_outside_quotes(pat, f":{name}", q)
            df = self.spark.sql(q, args=dict(params_dict))
        else:
            df = self.spark.sql(q)
        df._jdf.queryExecution().executedPlan()  # force physical planning
        return True

    def execute_ddl(self, stmt: str):
        """DDL passthrough (CREATE/DROP/ALTER ... run eagerly)."""
        return self.spark.sql(stmt)
