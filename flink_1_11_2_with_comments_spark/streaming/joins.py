"""Stream-stream joins — SURVEY §2.3 (streaming rows).

Interval join (StreamExecIntervalJoin.scala:54, TimeIntervalJoin.java:54,
KeyedStream.intervalJoin KeyedStream.java:396): r.ts ∈ [l.ts + lower,
l.ts + upper] with equi-keys. This is exactly the stream-stream join
pattern Spark supports natively — the time-range condition lets the
state store evict rows once the watermark passes the bound, same as
the reference's cleanup timers (IntervalJoinOperator.java:87).

The unbounded two-sided join (StreamingJoinOperator.java:38, state
kept forever unless idle-state TTL) maps to the same API without the
time bound; Spark then requires watermarks for state cleanup in
append mode — compose via this module with lower/upper = None and an
explicit state-TTL watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str],
    left_ts: str,
    right_ts: str,
    lower: str | None = "-5 minutes",
    upper: str | None = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows whose event times are within [lower, upper] of each other.

    lower/upper are SQL interval strings relative to the LEFT row's
    time: right_ts BETWEEN left_ts + lower AND left_ts + upper.
    Streaming use: both inputs must carry watermarks; Spark sizes the
    join state from the bound exactly like RowTimeIntervalJoin's
    relative window cleanup.
    """
    cond = on if isinstance(on, Column) else F.lit(True)
    if isinstance(on, list):
        for k in on:
            cond = cond & (left[k] == right[k])
    if lower is not None:
        cond = cond & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
    if upper is not None:
        cond = cond & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    return left.join(right, cond, how)
