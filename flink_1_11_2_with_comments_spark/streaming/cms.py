"""Streaming count-min sketch — additive keyed-state counters, the
sum-merge member of the mergeable-sketch quartet (HLL = max-merge in
streaming/hll.py, Greenwald-Khanna quantiles, Misra-Gries heavy
hitters).

Reference shape: a keyed streaming aggregate whose accumulator is one
counter (GroupAggFunction per-key ValueState); the key is the sketch
CELL (depth row i, bucket) — 256 keys for the 4x64 sketch, so the
stream shuffles once by cell and parallelism is the cell count, never
1. Counter addition is order-independent and micro-batch-agnostic, so
the drained counters are EXACTLY the batch groupBy counts at any
batching (pinned by tests/test_stateful.py::test_streaming_cms_parity)
and point estimates (min over rows of the probed cells) match the
batch events_countmin_point query.

Scale: state is one integer per cell; increments combine map-side in
the micro-batch before touching state.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .state import KeyedState, keyed_process


def cms_bucket(value: str, i: int, width: int = 64) -> int:
    """Mirror of the batch query's salted md5 bucket:
    md5('<i>|<value>') first 60 bits mod width."""
    return int(hashlib.md5(f"{i}|{value}".encode())
               .hexdigest()[:15], 16) % width


def cms_stream(df: DataFrame, value_col: str, depth: int = 4,
               width: int = 64) -> DataFrame:
    """Maintain the count-min counters over a stream: explode each
    row to its (i, bucket) cells JVM-side (the salted md5 runs in
    codegen), shuffle once by cell, add per-cell increments into
    keyed state. Emits (i, bucket, c, n_seen) per touched cell per
    micro-batch (update semantics)."""
    from ..pipeline.dedup import md5_int_expr

    cells = (df.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)]))
        .alias("i"),
        F.col(value_col).cast("string").alias("v"))
        .withColumn(
            "bucket",
            md5_int_expr(F.col("v"),
                         salt=F.concat(F.col("i").cast("string"),
                                       F.lit("|"))) % width))

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None or len(rows) == 0:
            return None
        c = state.get("c", 0) + len(rows)
        state.put("c", c)
        return pd.DataFrame([{"i": int(key[0]),
                              "bucket": int(key[1]),
                              "c": c, "n_seen": c}])

    return keyed_process(cells, ["i", "bucket"], fn,
                         "i int, bucket int, c bigint, n_seen bigint",
                         output_mode="update")


def cms_query(counters: dict[tuple[int, int], int], value: str,
              depth: int = 4, width: int = 64) -> int:
    """Point estimate from drained counters: min over depth rows."""
    return min(counters.get((i, cms_bucket(value, i, width)), 0)
               for i in range(depth))
