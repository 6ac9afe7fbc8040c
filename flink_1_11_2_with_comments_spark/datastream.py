"""DataStream API facade — SURVEY §3.3 / §2.2.

Reference: flink-streaming-java/.../datastream/DataStream.java — the
fluent per-record surface (map :570, flatMap :607, filter :718,
keyBy :275, union :205, process :676; KeyedStream.java — reduce :354
area, window :589 area). There the user topology IS the physical
plan; here every call appends to a DataFrame logical plan and
Catalyst plans it — same shape, better optimizer.

Per-record Python functions run as Arrow-batched mapInPandas
(DataStream.map's per-record contract, vectorized); expression-based
variants (map_expr/filter with a Column) stay fully JVM-side and are
preferred at scale. Works identically over batch and streaming
DataFrames — the reference's DataStream/DataSet split collapses.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataStream:
    """Fluent stream over a (batch or streaming) DataFrame."""

    def __init__(self, df: DataFrame):
        self._df = df

    def to_df(self) -> DataFrame:
        return self._df

    # -- per-record transforms -------------------------------------
    def map(self, fn: Callable[[dict], dict], schema: str) -> "DataStream":
        """DataStream.map (:570): one output record per input record.
        fn: row-dict → row-dict; schema: output DDL string."""
        def run(batches):
            for pdf in batches:
                yield pd.DataFrame([fn(r) for r in pdf.to_dict("records")])
        return DataStream(self._df.mapInPandas(run, schema))

    def flat_map(self, fn: Callable[[dict], list[dict]],
                 schema: str) -> "DataStream":
        """DataStream.flatMap (:607): 0..n output records per input."""
        def run(batches):
            for pdf in batches:
                out = [o for r in pdf.to_dict("records") for o in fn(r)]
                yield pd.DataFrame(out)
        return DataStream(self._df.mapInPandas(run, schema))

    def map_expr(self, *exprs) -> "DataStream":
        """Expression map — JVM-side, the scale path."""
        cols = [e if isinstance(e, Column) else F.expr(e) for e in exprs]
        return DataStream(self._df.select(*cols))

    def filter(self, predicate) -> "DataStream":   # DataStream.java:718
        if isinstance(predicate, (Column, str)):
            return DataStream(self._df.where(predicate))

        def run(batches):
            for pdf in batches:
                mask = [bool(predicate(r))
                        for r in pdf.to_dict("records")]
                yield pdf[pd.Series(mask, index=pdf.index)]
        return DataStream(self._df.mapInPandas(run, self._df.schema))

    def union(self, *others: "DataStream") -> "DataStream":  # :205
        df = self._df
        for o in others:
            df = df.unionAll(o._df)
        return DataStream(df)

    def key_by(self, *keys: str) -> "KeyedStream":  # :275
        return KeyedStream(self._df, list(keys))

    # -- physical partitioning (DataSet.java:1230-1359 / DataStream
    #    rebalance :368 area) ---------------------------------------
    def rebalance(self, n: int | None = None) -> "DataStream":
        return DataStream(self._df.repartition(n)
                          if n else self._df.repartition())

    def partition_by_hash(self, *keys: str) -> "DataStream":
        return DataStream(self._df.repartition(*keys))

    def partition_by_range(self, *keys: str) -> "DataStream":
        return DataStream(self._df.repartitionByRange(*keys))

    def sort_partition(self, *keys: str) -> "DataStream":
        return DataStream(self._df.sortWithinPartitions(*keys))

    def split(self, tags: dict[str, object]) -> dict[str, "DataStream"]:
        """Side outputs / SplitStream (DataStream.java:231;
        getSideOutput): tagged filter branches off one parent —
        Catalyst reuses the shared subplan across branches."""
        return {tag: self.filter(pred) for tag, pred in tags.items()}

    # -- sinks (DataStream.java:938-1234) ---------------------------
    def print(self, n: int = 20) -> None:
        self._df.show(n)

    def add_sink(self, foreach_batch_fn) -> object:
        """addSink (:1234): streaming foreachBatch; batch = direct call."""
        if self._df.isStreaming:
            return (self._df.writeStream.foreachBatch(foreach_batch_fn)
                    .start())
        foreach_batch_fn(self._df, 0)
        return None


class KeyedStream:
    """KeyedStream (KeyedStream.java:98)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def reduce(self, *aggs) -> DataStream:
        """KeyedStream.reduce/aggregate collapsed to per-key
        aggregation (the recompute model makes incremental reduce and
        full agg equivalent)."""
        cols = [a if isinstance(a, Column) else F.expr(a) for a in aggs]
        return DataStream(self._df.groupBy(*self._keys).agg(*cols))

    def sum(self, col: str) -> DataStream:          # KeyedStream sum
        return self.reduce(F.sum(col).alias(f"sum_{col}"))

    def min(self, col: str) -> DataStream:
        return self.reduce(F.min(col).alias(f"min_{col}"))

    def max(self, col: str) -> DataStream:
        return self.reduce(F.max(col).alias(f"max_{col}"))

    def window(self, ts_col: str, size: str,
               slide: str | None = None) -> "WindowedStream":
        """KeyedStream.window with a time assigner."""
        return WindowedStream(self._df, self._keys, ts_col, size, slide)

    def process(self, fn, out_schema: str,
                output_mode: str = "append") -> DataStream:
        """KeyedProcessFunction (KeyedStream.java:354) — routed to the
        stateful keyed_process operator (state + timers)."""
        from .streaming.state import keyed_process
        return DataStream(keyed_process(self._df, self._keys, fn,
                                        out_schema,
                                        output_mode=output_mode))


class WindowedStream:
    """WindowedStream.aggregate/apply (windowing surface)."""

    def __init__(self, df, keys, ts_col, size, slide):
        self._df, self._keys = df, keys
        self._win = (F.window(ts_col, size, slide) if slide
                     else F.window(ts_col, size))

    def aggregate(self, *aggs) -> DataStream:
        cols = [a if isinstance(a, Column) else F.expr(a) for a in aggs]
        return DataStream(
            self._df.groupBy(*self._keys, self._win.alias("w"))
            .agg(*cols)
            .withColumn("window_start", F.col("w.start"))
            .withColumn("window_end", F.col("w.end"))
            .drop("w"))
