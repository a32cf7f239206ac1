"""Stream-stream joins (Structured Streaming stateful join).

The reference has no streaming layer (SURVEY §2.10 -- its "streaming"
is batch pipelining), so this is engine-beyond-parity: the canonical
watermarked interval join both streams buffer state for, with the
time-range condition bounding how long either side's state lives.

Scale design: both inputs are watermarked, and the join condition
carries an explicit event-time interval -- that pair is what lets the
state store EVICT rows (an unconstrained stream-stream join would
buffer both streams forever). State per key is O(rows within the
interval), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _event_time


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    upper: str = "INTERVAL 6 HOURS",
    watermark: str = "12 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows onto left-stream rows with the same
    ``key`` where ``left_ts <= right_ts <= left_ts + upper``.

    The right frame must already use distinct column names (e.g. rename
    its ts to ``right_ts`` and its payload columns before calling);
    both sides get event-time watermarks. Inner joins emit as matches
    arrive; outer variants emit NULL-padded rows only after the
    watermark passes (standard Structured Streaming semantics)."""
    l = _event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = ((l[key] == r[f"{key}_r"])
            & (r[f"{right_ts}"] >= l[left_ts])
            & (r[f"{right_ts}"] <= F.expr(
                f"{left_ts} + {upper}")))
    return l.join(r, cond, how).drop(f"{key}_r")
