"""Temporal / as-of joins — SURVEY §2.3.

Reference operators:
- event-time temporal join: StreamExecTemporalJoin.scala:51,
  TemporalRowTimeJoinOperator.java:72 — join each probe row to the
  newest build-side version with version_ts <= probe_ts.
- proc-time temporal join: TemporalProcessTimeJoinOperator.java:40 —
  join against the latest version seen so far.
- lookup join (FOR SYSTEM_TIME AS OF proctime):
  StreamExecLookupJoin.scala:38 — per-row lookup into an external
  table; in Spark a stream-static join re-reads the static side per
  micro-batch, giving the same freshness contract.

Batch as-of strategy (scale-first): the union + last_value(ignorenulls)
running-window trick — ONE shuffle on the join key, no row explosion,
no per-row Python. This beats the naive join-then-filter (which
multiplies rows by version count) and survives 100 TB because state
per key is a single running value inside a window scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .state import KeyedState, keyed_process


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Batch as-of join: newest right row with right_ts <= left_ts per key.

    Rows from both sides are unioned, sorted once per key by time
    (right rows first on ties so `<=` holds), and right payloads are
    forward-filled with last(ignorenulls) — then only left rows are
    kept. Inner semantics (`how='inner'`) drop left rows with no
    preceding version.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts]

    lcols = [c for c in left.columns]
    # __is_right doubles as the version-presence marker: its forward
    # fill is non-null exactly when SOME version precedes the probe
    # row, so inner semantics stay correct even for all-NULL payloads
    r2 = right.select(
        *on, F.col(right_ts).alias("__ts"), F.lit(1).alias("__is_right"),
        *[F.col(c) for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on])
    l2 = left.select(
        *on, F.col(left_ts).alias("__ts"),
        F.lit(None).cast("int").alias("__is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_payload],
        *[F.col(c) for c in lcols if c not in on])

    unioned = r2.unionByName(l2)
    w = (W.partitionBy(*on)
         .orderBy(F.col("__ts"), F.desc_nulls_last("__is_right"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
               for c in right_payload],
        F.last("__is_right", ignorenulls=True).over(w)
        .alias("__asof_has_version"))
    left_rows = filled.where(F.col("__is_right").isNull())
    if how == "inner":
        left_rows = left_rows.where(
            F.col("__asof_has_version").isNotNull())
    return (left_rows
            .select(*on, F.col("__ts").alias(left_ts),
                    *[F.col(c) for c in lcols
                      if c not in on and c != left_ts],
                    *[F.col(f"__f_{c}").alias(c) for c in right_payload]))


def temporal_join_proctime(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    probe_cols: list[str],
    build_cols: list[str],
    probe_tag_col: str = "__side",
    order_col: str | None = None,
) -> DataFrame:
    """Streaming proc-time temporal join: latest-version state per key.

    Both streams are tagged and unioned, then a keyed stateful op
    keeps the newest build row per key and emits probe rows joined to
    it — TemporalProcessTimeJoinOperator semantics (join against the
    version current at processing time; no versioning history kept).

    probe/build inputs must already be tagged: probe rows have
    ``__side = 'p'``, build rows ``__side = 'b'`` and carry all
    probe_cols+build_cols (nulls on the other side's columns).

    order_col: Spark's shuffle erases intra-micro-batch arrival order
    (the reference sees records strictly in stream order); pass a
    timestamp/sequence column to restore a deterministic order inside
    each batch. Build rows sort before probe rows on ties.
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = (key_fields + ", "
                  + ", ".join(f"{c} double" for c in probe_cols) + ", "
                  + ", ".join(f"{c} double" for c in build_cols))
    unioned = probe.unionByName(build)

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None:
            return None
        if order_col is not None:
            # 'b' < 'p' → build first on order ties, so a same-instant
            # version is visible to the probe row (<= semantics)
            rows = rows.sort_values([order_col, probe_tag_col])
        out = []
        latest = state.get("v")
        for rec in rows.to_dict("records"):
            if rec[probe_tag_col] == "b":
                latest = {c: rec[c] for c in build_cols}
            elif latest is not None:
                out.append({
                    **{k: key[i] for i, k in enumerate(keys)},
                    **{c: rec[c] for c in probe_cols}, **latest})
        state.put("v", latest)
        return pd.DataFrame(out) if out else None

    return keyed_process(unioned, keys, fn, out_schema, output_mode="append")
