"""Numeric/hash mode switch, shared by queries and operators.

Two modes, selected by env var BODO_SPARK_EXACT (read at plan-build
time, so it must be set before a query function is called):

- fast (default, "0"): production-cost mode. Plain double arithmetic
  and xxhash64 (single vectorized JVM intrinsic) -- the cost profile
  of hand-written PySpark. A bare import gives this mode; bench.py
  runs it.
- exact ("1"): bit-reproducibility mode. Money arithmetic is
  DECIMAL-cast and hashes derive from md5 so every result is
  bit-identical to the DuckDB oracle regardless of partitioning,
  reduction order, or engine. The correctness gate (driver
  ``__spark_entry__.queries()`` and ``bodo_spark.verify``) opts in
  explicitly -- library users never pay the 2.5-4x decimal/md5 tax
  by default.

Results agree between modes up to float reduction-order low bits and
LSH candidate-recall noise (different hash families make slightly
different banding buckets; both are equally-valid MinHash estimators).
"""

from __future__ import annotations

import os


def exact_mode() -> bool:
    """True when the exact/reproducible mode is active (NOT the default:
    a bare import runs fast/double mode)."""
    return os.environ.get("BODO_SPARK_EXACT", "0") != "0"
