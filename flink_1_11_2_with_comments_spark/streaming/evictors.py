"""Window evictors — SURVEY §2.9 (previously a documented gap).

Reference: flink-streaming-java/.../windowing/evictors/{CountEvictor,
TimeEvictor,DeltaEvictor}.java — before the window function fires,
elements are removed from the window buffer:
- CountEvictor(n): evict from the front until ≤ n elements remain
  (keeps the last n).
- TimeEvictor(keep): currentTime = max element timestamp in the
  window; evict elements with ts ≤ currentTime - keep.
- DeltaEvictor(threshold, delta): evict elements whose
  delta(element, lastElement) ≥ threshold.

The reference buffers by arrival order; for a deterministic (and
batch/SQL-expressible) contract we define "order" as (ts, id) event
order — the event-time analogue. Eviction is a per-(key, window)
row-local decision, so the batch form is a window-function filter
(zero extra shuffles beyond the window partitioning) and the
streaming form applies the same rule to the buffered window at fire
time (watermark passes window end), exactly like the reference's
evict-before-apply.
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .state import KeyedState, keyed_process, utc_from_s, utc_ms


def _windowed(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    return df.withColumn("w", F.window(ts_col, size))


def _agg_kept(df: DataFrame, keys: list[str]) -> DataFrame:
    # decimal-accumulated sum: order-independent and engine-exact
    # (see queries/_util.py numeric-determinism note)
    total = F.round(F.sum(F.col("value").cast("decimal(30,10)")), 2) \
        .cast("double")
    # group by the window STRUCT, not w.start: the evictor window
    # function upstream is partitioned by (keys, w), and for tumbling
    # windows w <-> w.start is 1:1, so grouping by w lets the agg
    # reuse that partitioning (ClusteredDistribution satisfied -> no
    # second full shuffle of the events); w.start is projected after.
    return (df.groupBy(*keys, "w")
            .agg(F.count("*").alias("n_kept"), total.alias("total"))
            .select(*keys, F.col("w.start").alias("window_start"),
                    "n_kept", "total"))


def count_evictor_agg(df: DataFrame, keys: list[str], ts_col: str,
                      value_col: str, size: str, max_count: int,
                      id_col: str = "event_id") -> DataFrame:
    """Tumbling window agg keeping only the LAST max_count elements
    per (key, window) — CountEvictor.evict semantics."""
    w = Window.partitionBy(*keys, "w").orderBy(
        F.desc(ts_col), F.desc(id_col))
    return _agg_kept(
        _windowed(df, ts_col, size)
        .withColumn("value", F.col(value_col))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_count), keys)


def time_evictor_agg(df: DataFrame, keys: list[str], ts_col: str,
                     value_col: str, size: str, keep: str) -> DataFrame:
    """Tumbling window agg evicting elements older than
    max(ts in window) - keep — TimeEvictor semantics."""
    w = Window.partitionBy(*keys, "w")
    keep_expr = F.expr(f"INTERVAL {keep}")
    return _agg_kept(
        _windowed(df, ts_col, size)
        .withColumn("value", F.col(value_col))
        .withColumn("mx", F.max(ts_col).over(w))
        .where(F.col(ts_col) > F.col("mx") - keep_expr), keys)


def delta_evictor_agg(df: DataFrame, keys: list[str], ts_col: str,
                      value_col: str, size: str, threshold: float,
                      id_col: str = "event_id") -> DataFrame:
    """Tumbling window agg evicting elements with
    |value - value(last element in window)| ≥ threshold —
    DeltaEvictor with an absolute-difference DeltaFunction."""
    w = (Window.partitionBy(*keys, "w").orderBy(ts_col, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return _agg_kept(
        _windowed(df, ts_col, size)
        .withColumn("value", F.col(value_col))
        .withColumn("lastv", F.last(value_col).over(w))
        .where(F.abs(F.col(value_col) - F.col("lastv"))
               < F.lit(threshold)), keys)


def evicted_window_agg_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    size_sec: int,
    evictor: str,
    arg: float,
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming form: buffer (key, window) elements in keyed state;
    when the watermark passes the window end, apply the evictor to
    the buffered window and emit the aggregate (evict-before-apply,
    WindowOperator + Evictor contract). evictor ∈ {count, time,
    delta}; arg = max_count / keep_seconds / threshold."""
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, window_start timestamp, "
                  f"n_kept bigint, total double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        import datetime as dt
        buf = state.get("buf", [])
        wm = state.watermark_ms()
        if rows is not None:
            for rec in rows.to_dict("records"):
                # drop late rows (ts ≤ watermark): the reference drops
                # late elements — buffering them would rebuild an
                # already-fired window and re-fire a duplicate partial
                # aggregate on the next trigger
                if wm > 0 and utc_ms(rec[ts_col]) <= wm:
                    continue
                buf.append([rec[ts_col].isoformat(),
                            int(rec[id_col]), float(rec[value_col])])
        out, keep = [], []
        windows: dict[int, list] = {}
        for r in buf:
            wstart = (int(utc_ms(dt.datetime.fromisoformat(r[0])) // 1000)
                      // size_sec * size_sec)
            windows.setdefault(wstart, []).append(r)
        for wstart, els in sorted(windows.items()):
            if (wstart + size_sec) * 1000 > wm:
                keep.extend(els)  # window not complete yet
                continue
            els.sort(key=lambda r: (r[0], r[1]))  # (ts, id) order
            if evictor == "count":
                els = els[-int(arg):]
            elif evictor == "time":
                mx = dt.datetime.fromisoformat(els[-1][0])
                els = [r for r in els
                       if dt.datetime.fromisoformat(r[0])
                       > mx - dt.timedelta(seconds=arg)]
            elif evictor == "delta":
                lastv = els[-1][2]
                els = [r for r in els if abs(r[2] - lastv) < arg]
            exact = sum((decimal.Decimal(repr(r[2])).quantize(
                decimal.Decimal("1.0000000000")) for r in els),
                decimal.Decimal(0))
            out.append({
                **{k: key[i] for i, k in enumerate(keys)},
                "window_start": utc_from_s(wstart),
                "n_kept": len(els),
                "total": float(exact.quantize(decimal.Decimal("1.00"))),
            })
        state.put("buf", keep)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
