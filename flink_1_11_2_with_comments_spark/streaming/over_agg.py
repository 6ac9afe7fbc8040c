"""Streaming OVER aggregate — SURVEY §2.5 (stream rows).

Reference: StreamExecOverAggregate.scala:55 with
RowTimeRowsBoundedPrecedingFunction.java:1 — per key, an event-time
ordered ROWS BETWEEN (n-1) PRECEDING AND CURRENT ROW running
aggregate, emitted as the watermark advances (late rows dropped,
exactly the reference's behavior).

A per-micro-batch batch window function is NOT equivalent (frames
would reset at batch boundaries), hence this keyed stateful operator:
state = the last n-1 emitted rows (the frame context) + all
not-yet-final rows; emission is watermark-gated so out-of-order
arrivals inside the watermark settle into correct frame order first.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


def rows_bounded_preceding_sum(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    n_rows: int,
) -> DataFrame:
    """SUM(value) OVER (PARTITION BY keys ORDER BY ts
    ROWS BETWEEN n_rows-1 PRECEDING AND CURRENT ROW), streamed."""
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, {id_col} bigint, {ts_col} timestamp, "
                  f"running_sum double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        buf = state.get("buf", [])
        last = state.get("last")  # [ts_iso, id] high-water emission mark
        if rows is not None:
            for rec in rows.to_dict("records"):
                buf.append([rec[ts_col].isoformat(), int(rec[id_col]),
                            float(rec[value_col])])
        buf.sort()
        wm = state.watermark_ms()
        out = []
        emitted_upto = -1
        for i, (ts_iso, rid, val) in enumerate(buf):
            ts = dt.datetime.fromisoformat(ts_iso)
            if wm <= 0 or ts.timestamp() * 1000 > wm:
                break
            if last is not None and [ts_iso, rid] <= last:
                emitted_upto = i
                continue
            frame = buf[max(0, i - n_rows + 1): i + 1]
            out.append({
                **{k: key[j] for j, k in enumerate(keys)},
                id_col: rid, ts_col: ts,
                "running_sum": round(sum(v for _, _, v in frame), 6),
            })
            emitted_upto = i
        if out:
            state.put("last", [buf[emitted_upto][0], buf[emitted_upto][1]])
        # evict: emitted rows older than the frame context window
        keep_from = max(0, emitted_upto - n_rows + 2)
        state.put("buf", buf[keep_from:])
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
