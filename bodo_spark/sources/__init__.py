"""Source/sink layer: parquet, CSV, JSON, JDBC, Iceberg, in-memory pandas.

Reference parity (SURVEY.md 2.1):
  - read_parquet  -> reference bodo/pandas/base.py:183 (LogicalGetParquetRead)
  - to_parquet    -> reference bodo/pandas/frame.py:455
  - read_csv      -> reference bodo/pandas/base.py:392
  - read_json     -> reference bodo/ir/json_ext.py
  - read_sql      -> reference bodo/ir/sql_ext.py:140
  - read_iceberg  -> reference bodo/pandas/base.py:313
  - from_pandas   -> reference bodo/pandas/base.py:74

Everything here returns a plain pyspark DataFrame; the pandas-flavored
wrapper lives in bodo_spark.frame. Scans are declarative so Catalyst
pushes filters/column pruning into the file source (PushedFilters /
ReadSchema in .explain), which is the Spark-native version of the
reference's filter/limit pushdown (bodo/transforms/typing_pass.py:748).
"""

from .io import (  # noqa: F401
    from_pandas,
    read_csv,
    read_iceberg,
    read_json,
    read_parquet,
    read_sql,
    to_csv,
    to_iceberg,
    to_json,
    to_parquet,
    to_sql,
)
from .tables import load_table, load_tables, register_views  # noqa: F401
