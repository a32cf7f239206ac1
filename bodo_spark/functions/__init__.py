"""Function kernel surface (reference: BodoSQL/bodosql/kernels/).

Spark-first policy: every kernel that can be a pure-SQL expression is a
SQL UDF body (Catalyst inlines it -- zero call overhead, stays inside
whole-stage codegen); only genuinely non-expressible kernels (true
Jaro-Winkler) drop to Arrow-batched pandas UDFs.
"""

from .snowflake import (  # noqa: F401
    SNOWFLAKE_SQL_FNS,
    flatten,
    jaro_winkler,
    register_snowflake_fns,
)
