"""Changelog / RowKind modeling — SURVEY §1.1.

The reference runs changelog rows through the whole engine: RowKind
+I/-U/+U/-D (flink-core/.../types/RowKind.java:35-58) carried on
every RowData (flink-table-common/.../data/RowData.java:114-128),
with plan-wide mode inference (FlinkChangelogModeInferenceProgram).

Spark has no native mid-pipeline changelog; per SURVEY the model is
an explicit `__rowkind` column. This module materializes the
changelog OF an upsert stream (keyed versions ordered by event time):

    first version of a key        → +I new
    each subsequent version       → -U previous, +U new

(-D needs a delete marker in the source; the events table has none,
so deletes are exercised only through the streaming operator's API.)

The batch form is pure relational algebra — one window + a 3-way
union of filtered projections (Catalyst computes the lag window once
and reuses the subplan). The streaming form is the keyed stateful
operator: state = last emitted value per key, watermark-gated so
out-of-order versions settle into event-time order first — exactly
the contract of the reference's retraction-emitting operators
(GroupAggFunction.java:43 emits UPDATE_BEFORE/UPDATE_AFTER pairs the
same way).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .state import KeyedState, keyed_process, utc_ms


def to_changelog_batch(df: DataFrame, keys: list[str], ts_col: str,
                       id_col: str, value_col: str) -> DataFrame:
    """Changelog rows (+I / -U / +U) of the keyed version history.

    One lag-window pass + array-of-changes explode: the previous
    three-branch union re-ran the keyed window (shuffle + sort) once
    per RowKind (SCALE_r09 measured 3.59x at 10x data); each source
    row now maps to its one- or two-element change array in the same
    pass — identical rows, one shuffle."""
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    v = df.select(*keys, ts_col, id_col, F.col(value_col).alias("value"),
                  F.lag(value_col).over(w).alias("prev"))

    def ch(kind, val):
        return F.struct(F.lit(kind).alias("rowkind"),
                        val.alias("value"))

    changes = (F.when(F.col("prev").isNull(),
                      F.array(ch("+I", F.col("value"))))
               .otherwise(F.array(ch("-U", F.col("prev")),
                                  ch("+U", F.col("value")))))
    return (v.select(*keys, ts_col, id_col,
                     F.explode(changes).alias("_c"))
            .select(*keys, ts_col, id_col,
                    F.col("_c.rowkind").alias("rowkind"),
                    F.col("_c.value").alias("value")))


def to_changelog_stream(df: DataFrame, keys: list[str], ts_col: str,
                        id_col: str, value_col: str) -> DataFrame:
    """Streaming changelog: watermark-gated, emits the same rows as
    the batch form as versions become final."""
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (f"{key_fields}, {ts_col} timestamp, {id_col} bigint, "
                  f"rowkind string, value double")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        buf = state.get("buf", [])
        last = state.get("last")  # last emitted [value] or None
        if rows is not None:
            for rec in rows.to_dict("records"):
                buf.append([rec[ts_col].isoformat(), int(rec[id_col]),
                            float(rec[value_col])])
        buf.sort()
        wm = state.watermark_ms()
        out, remaining = [], []
        for ts_iso, rid, val in buf:
            ts = dt.datetime.fromisoformat(ts_iso)
            if wm <= 0 or utc_ms(ts) > wm:
                remaining.append([ts_iso, rid, val])
                continue
            base = {**{k: key[i] for i, k in enumerate(keys)},
                    ts_col: ts, id_col: rid}
            if last is None:
                out.append({**base, "rowkind": "+I", "value": val})
            else:
                out.append({**base, "rowkind": "-U", "value": last[0]})
                out.append({**base, "rowkind": "+U", "value": val})
            last = [val]
        state.put("buf", remaining)
        if last is not None:
            state.put("last", last)
        return pd.DataFrame(out) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append")
