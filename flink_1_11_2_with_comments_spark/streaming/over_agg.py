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

from .state import KeyedState, keyed_process, utc_ms


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
            if wm <= 0 or utc_ms(ts) > wm:
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


def range_bounded_preceding_sum(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    preceding_sec: int,
) -> DataFrame:
    """SUM(value) OVER (PARTITION BY keys ORDER BY ts RANGE BETWEEN
    INTERVAL preceding_sec PRECEDING AND CURRENT ROW), streamed —
    RowTimeRangeBoundedPrecedingFunction.java:59.

    SQL RANGE frames are peer-inclusive: the frame of a row holds
    every row with ts in [cur_ts - preceding, cur_ts], INCLUDING
    later-ordered rows that share cur_ts. The reference aggregates
    per distinct timestamp for exactly this reason; here a row is
    emittable only once its whole peer group is final (watermark past
    its ts), so peers are always complete at emission time. State
    evicts rows older than last_emitted_ts - preceding.
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, {id_col} bigint, {ts_col} timestamp, "
                  f"running_sum double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        buf = state.get("buf", [])
        last = state.get("last")
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
            # the row AND its peer group (same ts) must be final: a
            # strictly-later watermark guarantees no more peers arrive
            if wm <= 0 or utc_ms(ts) >= wm:
                break
            if last is not None and [ts_iso, rid] <= last:
                emitted_upto = i
                continue
            lo = (ts - dt.timedelta(seconds=preceding_sec)).isoformat()
            acc = sum(v for t_, _, v in buf
                      if lo <= t_ <= ts_iso)
            out.append({
                **{k: key[j] for j, k in enumerate(keys)},
                id_col: rid, ts_col: ts,
                "running_sum": round(acc, 6),
            })
            emitted_upto = i
        if out:
            state.put("last", [buf[emitted_upto][0], buf[emitted_upto][1]])
        if emitted_upto >= 0:
            last_ts = dt.datetime.fromisoformat(buf[emitted_upto][0])
            lo = (last_ts
                  - dt.timedelta(seconds=preceding_sec)).isoformat()
            buf = [r for r in buf if r[0] >= lo
                   or [r[0], r[1]] > [buf[emitted_upto][0],
                                      buf[emitted_upto][1]]]
        state.put("buf", buf)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")


def proctime_unbounded_preceding_sum(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
) -> DataFrame:
    """SUM(value) OVER (PARTITION BY keys ORDER BY proctime ROWS
    UNBOUNDED PRECEDING), streamed —
    ProcTimeUnboundedPrecedingFunction.java:46: a per-key running
    accumulator over ARRIVAL order; no buffering, no watermark (proc
    time never retracts), state = one scalar per key."""
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = f"{key_fields}, {id_col} bigint, running_sum double"

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        acc = state.get("acc", 0.0)
        out = []
        for rec in rows.to_dict("records"):
            acc += float(rec[value_col])
            out.append({**{k: key[i] for i, k in enumerate(keys)},
                        id_col: int(rec[id_col]),
                        "running_sum": round(acc, 6)})
        state.put("acc", acc)
        return pd.DataFrame(out)

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
