"""Custom window triggers — SURVEY §2.9 (previously documented gaps).

Reference: flink-streaming-java/.../windowing/triggers/
- DeltaTrigger: fire when delta(last_fired_element, current) exceeds
  a threshold (used with GlobalWindows for threshold-based emission).
- PurgingTrigger: wrap another trigger; on fire, PURGE the window
  state instead of keeping it.
- Punctuated watermarks (eventtime/WatermarkStrategy punctuated
  generator): specific MARKER EVENTS advance event time, rather than
  a bounded delay behind the max timestamp.

Structured Streaming has one global watermark and no per-window
trigger API, but applyInPandasWithState sees every row in arrival
order plus per-key state — all three semantics are implementable as
keyed stateful operators, which is exactly where the reference runs
them (per-key trigger state in WindowOperator).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process, utc_from_s, utc_ms


def delta_trigger_agg(df: DataFrame, keys: list[str], value_col: str,
                      threshold: float, ts_col: str = "ts",
                      id_col: str = "event_id",
                      purging: bool = True) -> DataFrame:
    """GlobalWindow + DeltaTrigger(threshold): per key, accumulate
    rows; FIRE when |value − value_at_last_fire| ≥ threshold.
    purging=True is PurgingTrigger(DeltaTrigger(...)): the window
    clears on fire (each emission covers only rows since the last
    fire); purging=False keeps the window (running totals).

    Rows are processed in (ts, id) order within each micro-batch, so
    a time-ordered replay makes the firing sequence deterministic.
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, fire_id bigint, n bigint, "
                  f"total double, fire_value double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        buf_n = state.get("n", 0)
        buf_sum = state.get("sum", 0.0)
        ref = state.get("ref")  # value at last fire; None before first
        out = []
        recs = sorted(rows.to_dict("records"),
                      key=lambda r: (r[ts_col], r[id_col]))
        for rec in recs:
            v = float(rec[value_col])
            buf_n += 1
            buf_sum += v
            if ref is None:
                ref = [v]  # first element initializes the reference
                continue
            if abs(v - ref[0]) >= threshold:
                out.append({
                    **{k: key[i] for i, k in enumerate(keys)},
                    "fire_id": int(rec[id_col]), "n": buf_n,
                    "total": round(buf_sum, 6), "fire_value": v,
                })
                ref = [v]
                if purging:
                    buf_n, buf_sum = 0, 0.0
        state.put("n", buf_n)
        state.put("sum", buf_sum)
        if ref is not None:
            state.put("ref", ref)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")


def punctuated_window_agg(df: DataFrame, keys: list[str],
                          size_sec: int, value_col: str,
                          marker_col: str, ts_col: str = "ts",
                          id_col: str = "event_id") -> DataFrame:
    """Tumbling window aggregate driven by a PUNCTUATED watermark:
    event time advances only when a marker row arrives (its ts IS the
    new per-key watermark) — WatermarkStrategy punctuated generator.
    Non-marker rows at or behind the punctuated watermark are dropped
    as late; a window emits when a marker's ts passes its end.

    This ignores Spark's global bounded-delay watermark entirely —
    the punctuation IS the clock, per key, which is precisely the
    semantics Structured Streaming cannot express natively.
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, window_start timestamp, n bigint, "
                  f"total double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        import datetime as dt
        if rows is None:
            return None
        wm = state.get("pwm")  # [iso ts] punctuated watermark
        windows = state.get("win", {})  # wstart_epoch -> [n, sum]
        out = []
        recs = sorted(rows.to_dict("records"),
                      key=lambda r: (r[ts_col], r[id_col]))
        for rec in recs:
            ts = rec[ts_col]
            if rec[marker_col]:
                new_wm = ts.isoformat()
                if wm is None or new_wm > wm[0]:
                    wm = [new_wm]
                    # emit every window whose end ≤ punctuated wm
                    for wstart in sorted(windows, key=int):
                        if utc_from_s(int(wstart) + size_sec) <= ts:
                            n, s = windows.pop(wstart)
                            out.append({
                                **{k: key[i]
                                   for i, k in enumerate(keys)},
                                "window_start":
                                    utc_from_s(int(wstart)),
                                "n": n, "total": round(s, 6),
                            })
                continue
            if wm is not None and ts.isoformat() <= wm[0]:
                continue  # late behind the punctuated clock
            wstart = int(utc_ms(ts) // 1000) // size_sec * size_sec
            n, s = windows.get(str(wstart), [0, 0.0])
            windows[str(wstart)] = [n + 1, s + float(rec[value_col])]
        state.put("win", windows)
        if wm is not None:
            state.put("pwm", wm)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
