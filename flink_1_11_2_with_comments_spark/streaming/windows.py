"""Group-window assigners — Flink TUMBLE/HOP/SESSION → Spark windows.

Reference:
- assigners: flink-table-runtime-blink rt/window/assigners/
  {Tumbling,Sliding,Session}WindowAssigner.java; DataStream layer
  flink-streaming-java .../windowing/assigners/.
- planner node: StreamExecGroupWindowAggregate.scala:33,
  rt/window/WindowOperator.java:98.

Spark's window()/session_window() are the same assigners evaluated as
expressions; the streaming state management (pane merge for sessions,
watermark-driven eviction) is Structured Streaming's stateful agg.
Count windows (KeyedStream.countWindow) have no Spark expression —
see streaming/count_window.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tumble(ts_col: str | Column, size: str) -> Column:
    """TUMBLE(ts, INTERVAL size): fixed, non-overlapping windows.

    TumblingEventTimeWindows.of(Time...) — each element in exactly
    one window [floor(ts/size)*size, +size).
    """
    return F.window(ts_col, size)


def hop(ts_col: str | Column, size: str, slide: str) -> Column:
    """HOP(ts, INTERVAL slide, INTERVAL size): sliding windows.

    SlidingEventTimeWindows.of(size, slide) — each element lands in
    size/slide windows.
    """
    return F.window(ts_col, size, slide)


def session(ts_col: str | Column, gap: str) -> Column:
    """SESSION(ts, INTERVAL gap): merge events closer than gap.

    EventTimeSessionWindows.withGap — Spark's session_window merges
    overlapping [ts, ts+gap) ranges per group key; a dynamic gap is
    expressed by passing a Column for gap (Spark supports it), the
    analogue of DynamicEventTimeSessionWindows.
    """
    return F.session_window(ts_col, gap)


def window_bounds(win_col: str = "window") -> list[Column]:
    """TUMBLE_START/TUMBLE_END etc. (FlinkSqlOperatorTable.java:778-810)
    → the window struct's start/end fields."""
    return [F.col(f"{win_col}.start").alias("window_start"),
            F.col(f"{win_col}.end").alias("window_end")]
