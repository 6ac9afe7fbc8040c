"""KeyedProcessFunction equivalent — SURVEY §2.9 keyed state + timers.

Reference surface being mirrored:
- KeyedProcessFunction (KeyedStream.process, KeyedStream.java:354):
  per-key record processing with ValueState/MapState
  (flink-core/.../api/common/state/, 21 files) and event/proc-time
  timers.
- State TTL (StateTtlConfig.java) → GroupStateTimeout.

Spark mapping: ``applyInPandasWithState`` gives one GroupState object
per key. We expose a dict-like state (JSON-serialized into the state
struct — one state blob per key, the same granularity as Flink's
per-key state backend entry) plus a timer facility backed by the
GroupState timeout. Records arrive as Arrow batches, not per record:
the process function sees (key, pandas rows, state) once per
micro-batch — the mini-batch execution mode the reference added for
throughput (AbstractMapBundleOperator.java:1) is the native mode here.
"""

from __future__ import annotations

import datetime as _dt
import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def utc_ms(ts: _dt.datetime) -> float:
    """Naive datetime (UTC semantics — Spark's session timezone here)
    → epoch millis. Plain ``.timestamp()`` interprets a naive datetime
    in the HOST timezone, which shifts every watermark comparison when
    the host is not UTC (state.watermark_ms() is UTC epoch millis)."""
    return ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000


def utc_from_s(sec: float) -> _dt.datetime:
    """Epoch seconds → naive UTC datetime (the inverse of utc_ms;
    ``datetime.fromtimestamp`` without a tz would localize to the
    host zone)."""
    return _dt.datetime.fromtimestamp(
        sec, tz=_dt.timezone.utc).replace(tzinfo=None)


class KeyedState:
    """Dict-like per-key state: the ValueState/MapState analogue.

    Everything JSON-serializable can be stored. ``register_timer``
    arms the group-state timeout (one timer per key — Flink allows
    many; multiple logical timers can be multiplexed by storing their
    fire times in the state and re-arming the earliest).
    """

    def __init__(self, raw: GroupState):
        self._gs = raw
        if raw.exists:
            (blob,) = raw.get
            self._data: dict[str, Any] = json.loads(blob) if blob else {}
        else:
            self._data = {}
        self.timed_out = raw.hasTimedOut

    def get(self, k: str, default=None):
        return self._data.get(k, default)

    def put(self, k: str, v) -> None:
        self._data[k] = v

    def __contains__(self, k: str) -> bool:
        return k in self._data

    def clear(self) -> None:
        self._data = {}
        self._cleared = True

    def register_processing_timer(self, after_ms: int) -> None:
        self._gs.setTimeoutDuration(after_ms)

    def register_event_timer(self, at_epoch_ms: int) -> None:
        self._gs.setTimeoutTimestamp(at_epoch_ms)

    def watermark_ms(self) -> int:
        return self._gs.getCurrentWatermarkMs()

    def _flush(self) -> None:
        if getattr(self, "_cleared", False) and not self._data:
            self._gs.remove()
        else:
            self._gs.update((json.dumps(self._data),))


ProcessFn = Callable[[tuple, pd.DataFrame | None, KeyedState],
                     Iterator[pd.DataFrame] | pd.DataFrame | None]


def keyed_process(
    df: DataFrame,
    keys: list[str],
    fn: ProcessFn,
    output_schema: str,
    output_mode: str = "append",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Run a KeyedProcessFunction-style ``fn`` over a keyed stream.

    fn(key, rows, state): rows is the concatenated pandas batch for
    this key in this micro-batch (None on a pure timer firing);
    returns output rows (DataFrame / iterator / None). Timers fire as
    a call with rows=None and state.timed_out=True — the analogue of
    KeyedProcessFunction.onTimer.
    """
    timeout_conf = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]

    def wrapper(key, pdf_iter, gstate: GroupState):
        state = KeyedState(gstate)
        if state.timed_out:
            out = fn(key, None, state)
        else:
            pdfs = [p for p in pdf_iter]
            rows = pd.concat(pdfs) if pdfs else None
            out = fn(key, rows, state)
        state._flush()
        if out is None:
            return iter(())
        if isinstance(out, pd.DataFrame):
            return iter((out,))
        return out

    return df.groupBy(*keys).applyInPandasWithState(
        wrapper, output_schema, "state_json string", output_mode, timeout_conf)
