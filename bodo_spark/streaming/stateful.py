"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windows (windows.py) cover time-bucketed state; this module
is the seam for ARBITRARY per-key state machines -- the Spark analogue
of hand-written stateful operators. Shapes provided:

- running_totals_stateful: per-key running count/sum maintained in
  GroupState across micro-batches (timeout-free accumulator). Over a
  static source with AvailableNow the final state equals the batch
  groupBy, which is exactly how the tests pin its correctness.
- dedup_stream: watermarked streaming drop-duplicates
  (dropDuplicatesWithinWatermark) -- exact dedup with bounded state,
  the streaming twin of operators/dedup.exact_dedup.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import _event_time


def running_totals_stateful(df: DataFrame, key_col: str,
                            value_col: str) -> DataFrame:
    """Per-key running (n, total) in explicit GroupState: each
    micro-batch folds its rows into the state tuple and emits the
    updated totals. State is two doubles per key -- bounded by key
    cardinality, the canonical accumulator shape."""
    out_schema = f"{key_col} long, n long, total double"
    state_schema = "n long, total double"

    def fn(key: Tuple[Any], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def dedup_stream(df: DataFrame, subset: list[str], ts_col: str,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for keys older than
    the watermark is evicted (reference exact-dedup semantics under a
    late-data bound)."""
    df = _event_time(df, ts_col)
    return (df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(subset))
