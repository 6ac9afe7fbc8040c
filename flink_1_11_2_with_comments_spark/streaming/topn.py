"""Streaming TopN — SURVEY §2.5.

Reference: StreamExecRank.scala:52 with three strategies —
AppendOnlyTopNFunction.java:48 (insert-only input, keeps a sorted
top-k buffer per partition key), UpdatableTopNFunction.java:63 and
RetractableTopNFunction.java:57 (changelog inputs).

Spark mapping: insert-only input → keyed stateful operator holding
the current top-k per key and emitting the refreshed top-k each
micro-batch (update semantics; Spark can't retract emitted rows, so
consumers read the latest emission per key — exactly how the
reference's sinks consume upsert streams keyed on (partition, rank)).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


def streaming_topn(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    k: int,
    payload_cols: list[str],
    ascending: bool = False,
) -> DataFrame:
    """Incrementally maintained per-key top-k over an append-only stream.

    Output schema: partition keys + payload + order col + rank. Each
    micro-batch emits the key's full refreshed top-k (upsert by
    (keys, rank) downstream), mirroring AppendOnlyTopNFunction's
    emission of updated ranks.
    """
    cols = list(dict.fromkeys(payload_cols + [order_col]))
    key_fields = ", ".join(f"{c} string" for c in partition_by)
    out_schema = (f"{key_fields}, "
                  + ", ".join(f"{c} double" for c in cols)
                  + ", rank int")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        buf = state.get("topk", [])
        if rows is not None:
            buf.extend(rows[cols].to_dict("records"))
        buf.sort(key=lambda r: r[order_col], reverse=not ascending)
        buf = buf[:k]
        state.put("topk", buf)
        out = pd.DataFrame(buf)
        for i, kcol in enumerate(partition_by):
            out[kcol] = str(key[i])
        out["rank"] = range(1, len(out) + 1)
        return out[[*partition_by, *cols, "rank"]]

    return keyed_process(df, partition_by, fn, out_schema,
                         output_mode="update")
