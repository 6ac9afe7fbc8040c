"""Count windows — SURVEY §2.9.

Reference: KeyedStream.countWindow (KeyedStream.java:589) +
CountTumblingWindowAssigner / ElementTriggers.count — emit an
aggregate for every N elements per key; the partial window stays in
state until it fills.

No Spark expression exists for this (windows are time-based), so it
is a keyed stateful operator: buffer rows per key, emit one output
row per full window of N, keep the remainder across micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


def count_tumbling_window(
    df: DataFrame,
    keys: list[str],
    size: int,
    value_col: str,
) -> DataFrame:
    """Per-key tumbling count window of ``size`` rows: emits
    (key, window_seq, n, sum, min, max) when each window fills.

    Arrival order within a micro-batch follows the input batch order;
    cross-batch order follows micro-batch sequence — same contract as
    the reference (count windows are arrival-order defined).
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, window_seq bigint, n bigint, "
                  f"total double, vmin double, vmax double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        buf = state.get("buf", [])
        seq = state.get("seq", 0)
        buf.extend(float(v) for v in rows[value_col])
        out = []
        while len(buf) >= size:
            win, buf = buf[:size], buf[size:]
            out.append({
                **{k: key[i] for i, k in enumerate(keys)},
                "window_seq": seq, "n": size, "total": sum(win),
                "vmin": min(win), "vmax": max(win),
            })
            seq += 1
        state.put("buf", buf)
        state.put("seq", seq)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")


def count_sliding_window(
    df: DataFrame,
    keys: list[str],
    size: int,
    slide: int,
    value_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key SLIDING count window — countWindow(size, slide)
    (KeyedStream.java:589 two-arg form; CountSlidingWindowAssigner +
    ElementTriggers.count(slide)): every ``slide`` arrivals, emit the
    aggregate over the last ``size`` elements (fewer while warming
    up — the reference fires on partial first windows too).

    Rows are processed in (ts, id) order within each micro-batch, so
    with a time-ordered replay the firing sequence is deterministic
    and equals the batch OVER-frame formulation (the oracle).
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, fire_seq bigint, n bigint, "
                  f"total double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        buf = state.get("buf", [])  # last ≤ size values
        n = state.get("n", 0)
        out = []
        recs = sorted(rows.to_dict("records"),
                      key=lambda r: (r[ts_col], r[id_col]))
        for rec in recs:
            buf.append(float(rec[value_col]))
            if len(buf) > size:
                buf.pop(0)
            n += 1
            if n % slide == 0:
                out.append({
                    **{k: key[i] for i, k in enumerate(keys)},
                    "fire_seq": n // slide, "n": len(buf),
                    "total": round(sum(buf), 6),
                })
        state.put("buf", buf)
        state.put("n", n)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
