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
    k_typ = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {k_typ}, n long, total double"
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


def funnel_stream_stateful(df: DataFrame, steps: list[str], *,
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id") -> DataFrame:
    """Streaming ordered-funnel progression (the batch
    operators/timebucket.funnel_stages as a REAL cross-batch state
    machine): per user, the step-typed event buffer accumulates in
    GroupState across micro-batches and the reached stage is re-folded
    and emitted per batch. Correct under arbitrary out-of-order
    arrival ACROSS batches (an early 'view' arriving late re-chains
    everything -- a chain-scalar state could never recover it), and
    the emitted stage is MONOTONE non-decreasing per user (more events
    can only extend the best chain), so the final/max update equals
    the batch fold over the full history -- the stream_funnel gate
    pins exactly that against the batch oracle.

    State per user = that user's step-typed events (the same per-user
    bound the batch groupBy holds in its sort buffer), stored as
    parallel (sortable key, type) arrays; the key string
    zero-padded(epoch_micros)|zero-padded(event_id) sorts identically
    to the batch struct(ts, id) order. Ids must be NON-NEGATIVE: the
    zero-pad is lexicographic, and a '-' sign reverses order among
    negatives ('-9' sorts after '-1')."""
    if not steps:
        raise ValueError("steps must be non-empty")
    # fixed-width formatted ts (works for TIMESTAMP and TIMESTAMP_NTZ
    # alike -- parquet round-trips often come back NTZ) + zero-padded id:
    # lexicographic order == the batch struct(ts, id) order. Pad to 20
    # chars -- int64 max is 19 digits, and Spark lpad TRUNCATES strings
    # longer than the pad width, so a 12-char pad would silently corrupt
    # ids >= 10^12 (plausible at 100-TB event volumes).
    ev = (df.where(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col).alias("_u"),
                  F.concat(
                      F.date_format(F.col(ts_col),
                                    "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                      F.lit("|"),
                      F.lpad(F.col(id_col).cast("string"), 20, "0"))
                  .alias("_k"),
                  F.col(type_col).alias("_e")))
    # derive the key's output type from the input instead of assuming
    # long -- string/int32 user ids stream through unchanged
    u_typ = df.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {u_typ}, stage long"
    state_schema = "ks array<string>, es array<string>"

    def fn(key: Tuple[Any], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ks, es = list(state.get[0]), list(state.get[1])
        else:
            ks, es = [], []
        for pdf in pdfs:
            ks.extend(pdf["_k"])
            es.extend(pdf["_e"])
        state.update((ks, es))
        acc = 0
        for i in sorted(range(len(ks)), key=lambda j: ks[j]):
            if acc < len(steps) and es[i] == steps[acc]:
                acc += 1
        yield pd.DataFrame({user_col: [key[0]], "stage": [acc]})

    return (ev.groupBy("_u")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
