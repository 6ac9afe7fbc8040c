"""Late-data side output — SURVEY §2.9 (previously a documented gap).

Reference: WindowedStream.sideOutputLateData(tag) — rows arriving
behind the watermark are not dropped but routed to a tagged side
stream (WindowOperator.java:317 sideOutput branch).

Spark's built-in stateful operators (window aggs, dedup, joins) drop
late rows before the operator; there is no side channel. But
applyInPandasWithState does NOT pre-filter late data — the operator
sees every row plus the current watermark. So the side output is
recoverable: a keyed pass-through that tags each row with
``is_late = (ts ≤ watermark at arrival)``. Downstream, two filtered
branches of the tagged stream are the main/late outputs — the same
two-stream shape as the reference's OutputTag, and the main branch
feeds any windowed aggregation knowing late rows were already
diverted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process, utc_ms


def tag_late_rows(df: DataFrame, keys: list[str], ts_col: str,
                  id_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """Pass-through with an ``is_late`` tag per row (late = event time
    at or behind the watermark when the row arrived)."""
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, {id_col} bigint, {ts_col} timestamp, "
                  f"{value_col} double, is_late boolean")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        wm = state.watermark_ms()
        out = []
        for rec in rows.to_dict("records"):
            out.append({
                **{k: key[i] for i, k in enumerate(keys)},
                id_col: int(rec[id_col]), ts_col: rec[ts_col],
                value_col: float(rec[value_col]),
                "is_late": bool(wm > 0
                                and utc_ms(rec[ts_col]) <= wm),
            })
        return pd.DataFrame(out)

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
