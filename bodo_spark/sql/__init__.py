"""Snowflake-ish SQL surface (reference BodoSQL).

The reference runs a Calcite planner + Python codegen
(reference BodoSQL/bodosql/context.py:504, RelationalAlgebraGenerator.java);
here spark.sql IS the planner, so this layer is only:
  - table registration (pandas / pyspark / BodoDataFrame -> temp views)
  - QUALIFY desugaring (Spark has no QUALIFY clause;
    reference MinRowNumberFilterRule / test_qualify.py)
  - Snowflake function shims registered as SQL expressions
"""

from .context import BodoSQLContext, desugar_qualify, register_snowflake_fns  # noqa: F401
