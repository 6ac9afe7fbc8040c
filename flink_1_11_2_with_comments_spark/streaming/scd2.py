"""Streaming SCD2 / temporal-table maintenance — the incremental
keyed-state twin of the batch `scd2_dimension_build` query.

Reference: the reference's full temporal-table story keeps a versioned
table updated from a changelog and lets event-time joins probe it
(TemporalRowTimeJoinOperator.java:72 — right-side state holds the
version history per key; TemporalTableFunction.java:35). The batch
build (queries/streaming_batch.py) materializes that history with
windows; THIS operator maintains it incrementally in per-key state as
changes stream in — the CDC changelog (sources/cdc.py) composes in
front, the as-of join (streaming/asof.py) probes the result.

State per key: the version list [(status, valid_from_ns), ...] — the
exact [valid_from, valid_to) interval chain, O(#status-changes) per
key, NOT O(#events): no-change updates collapse on arrival (the LAG
change-detection of the batch build, applied incrementally), so state
stays bounded by genuine transitions.

Emission (update semantics): every micro-batch that touches a key
re-emits the key's FULL version table stamped with n_seen; readers
take each key's max-n_seen rows. After the stream drains, that
snapshot is ROW-IDENTICAL to the batch build at ANY micro-batching
(pinned by tests/test_stateful.py::test_streaming_scd2_parity).

Scale: one shuffle by key (the applyInPandasWithState exchange);
state per key is the transition count; emission is proportional to
versions touched, never the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


def scd2_maintain(df: DataFrame, key: str = "user_id",
                  status_col: str = "event_type",
                  ts_col: str = "ts",
                  seq_col: str = "event_id") -> DataFrame:
    """Maintain an SCD2 versioned table from a keyed change stream.

    Rows must arrive per-key in event order across micro-batches
    (in-order source or upstream sort); within a batch any order is
    fine — the batch is sorted by (ts, seq) before applying. A
    cross-batch order regression (a row whose (ts, seq) is not after
    the last applied one) raises ValueError instead of silently
    appending an inconsistent version chain (round-9 advisor fix —
    unlike the order-independent HLL/KMV/CMS twins, SCD2 state is
    order-sensitive, so corruption must be loud).
    Output: (key, status, valid_from, valid_to, version, is_current,
    n_seen) — the batch build's columns plus the n_seen cursor.
    """
    out_schema = (f"{key} bigint, status string, "
                  f"valid_from timestamp, valid_to timestamp, "
                  f"version int, is_current boolean, n_seen bigint")

    def fn(k, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None or len(rows) == 0:
            return None
        rows = rows.sort_values([ts_col, seq_col])
        versions: list = state.get("versions", [])
        n = state.get("n", 0) + len(rows)
        last = state.get("last", None)  # (ts_ns, seq) last applied
        first_ts = int(pd.Timestamp(rows[ts_col].iloc[0]).value)
        first_seq = int(rows[seq_col].iloc[0])
        if last is not None and (first_ts, first_seq) <= tuple(last):
            raise ValueError(
                f"scd2_maintain: out-of-order arrival for key {k}: "
                f"batch starts at (ts={first_ts}, seq={first_seq}) "
                f"but (ts={last[0]}, seq={last[1]}) was already "
                f"applied — per-key event-order across micro-batches "
                f"is required (sort or buffer upstream)")
        state.put("last", [int(pd.Timestamp(rows[ts_col].iloc[-1]).value),
                           int(rows[seq_col].iloc[-1])])
        for status, ts in zip(rows[status_col], rows[ts_col]):
            if not versions or versions[-1][0] != status:
                # pandas Timestamp.value: exact ns since epoch (naive
                # == UTC under the session's UTC timezone)
                versions.append([status, int(pd.Timestamp(ts).value)])
        state.put("versions", versions)
        state.put("n", n)
        return pd.DataFrame([{
            key: k[0],
            "status": status,
            "valid_from": pd.Timestamp(vfrom_ns),
            "valid_to": (pd.Timestamp(versions[i + 1][1])
                         if i + 1 < len(versions) else pd.NaT),
            "version": i + 1,
            "is_current": i + 1 == len(versions),
            "n_seen": n,
        } for i, (status, vfrom_ns) in enumerate(versions)])

    return keyed_process(df, [key], fn, out_schema,
                         output_mode="update")
