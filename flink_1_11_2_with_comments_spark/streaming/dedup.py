"""Streaming deduplication — SURVEY §2.5 (Deduplicate row).

Reference: StreamExecDeduplicate.scala:52 — the planner rewrites
ROW_NUMBER()=1 OVER (PARTITION BY keys ORDER BY time) into a keyed
stateful operator keeping the first or last row per key
(DeduplicateKeepFirstRowFunction.java:36 / KeepLast...:36).

Spark mapping:
- keep-first, bounded state → dropDuplicatesWithinWatermark(keys)
  (state evicted once the watermark passes; the analogue of dedup
  with idle-state retention).
- keep-first, unbounded    → dropDuplicates(keys) (state grows
  forever, same as the reference without TTL).
- keep-last → an update-mode aggregation (max_by over time) or the
  keyed-process operator (streaming/state.py); keep-last cannot be
  append-only — it retracts, exactly why the reference emits
  UPDATE_BEFORE/UPDATE_AFTER rows for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deduplicate(df: DataFrame, keys: list[str], keep: str = "first",
                time_col: str | None = None,
                within_watermark: bool = False) -> DataFrame:
    """Keep one row per key.

    keep='first': arrival-order first (streaming) — dropDuplicates.
    keep='last' : requires time_col; update-mode max_by aggregation.
    """
    if keep == "first":
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(keys)
        return df.dropDuplicates(keys)
    if keep == "last":
        if time_col is None:
            raise ValueError("keep='last' needs time_col")
        value_cols = [c for c in df.columns if c not in keys]
        aggs = [F.expr(f"max_by({c}, {time_col})").alias(c) for c in value_cols]
        return df.groupBy(*keys).agg(*aggs)
    raise ValueError(f"keep must be first|last, got {keep!r}")
