"""Streaming HyperLogLog — keyed-state registers maintained
incrementally, the streaming twin of the batch `events_hll_distinct`
query (queries/pipeline_ops.py).

Reference shape: a keyed streaming aggregate whose accumulator is the
64-register HLL array (GroupAggFunction's per-key ValueState — the
reference ships HLL-style accumulators in its aggregate library), and
registers merge by MAX — which is ORDER-INDEPENDENT and idempotent, so
the drained stream's registers are bit-equal to the batch aggregate at
ANY micro-batching and under replays (pinned by
tests/test_stateful.py::test_streaming_hll_parity).

State per key: 64 small ints — constant, the whole point of HLL.
The stream shuffles once on the key; emission per touched key per
micro-batch (update semantics, latest n_seen wins).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

from ._hash import md5_60bit_distinct
from .state import KeyedState, keyed_process


def _rho(w: int) -> int:
    """Leading-zero count of the 54-bit remainder, +1 — the integer
    mirror of the batch query's hex-string arithmetic."""
    if w == 0:
        return 55
    return 54 - w.bit_length() + 1


def hll_estimate(registers: list[int]) -> tuple[int, int, float]:
    """(n_zero, s_scaled, estimate) from 64 registers — identical
    arithmetic to the batch query: the register sum is EXACT integer
    sum of 2^(55-M), the estimate divides doubles in the same order,
    small-range linear counting below 2.5m."""
    n_zero = sum(1 for m in registers if m == 0)
    s_scaled = sum(1 << (55 - m) for m in registers)
    raw = 0.709 * 4096.0 * 36028797018963968.0 / float(s_scaled)
    if n_zero > 0 and raw <= 160.0:
        est = round(64.0 * math.log(64.0 / n_zero), 4)
    else:
        est = round(raw, 4)
    return n_zero, s_scaled, est


def hll_distinct_stream(df: DataFrame, keys: list[str],
                        value_col: str) -> DataFrame:
    """Per-key streaming distinct-count sketch: maintain the 64 HLL
    registers in keyed state, emit (key, n_zero, s_scaled,
    est_distinct, n_seen) every micro-batch."""
    key_fields = ", ".join(f"{c} string" for c in keys)
    out_schema = (f"{key_fields}, n_zero int, s_scaled bigint, "
                  f"est_distinct double, n_seen bigint")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None or len(rows) == 0:
            return None
        regs = state.get("regs", [0] * 64)
        n = state.get("n", 0) + len(rows)
        # registers are a max-merge over the DISTINCT hash multiset:
        # hash once per distinct value in the batch (C-level unique
        # pass), identical registers to the per-row loop (round-9)
        for hv in md5_60bit_distinct(rows[value_col]):
            b, w = hv % 64, hv // 64
            r = _rho(w)
            if r > regs[b]:
                regs[b] = r
        state.put("regs", regs)
        state.put("n", n)
        n_zero, s_scaled, est = hll_estimate(regs)
        return pd.DataFrame([{
            **{c: str(key[i]) for i, c in enumerate(keys)},
            "n_zero": n_zero, "s_scaled": s_scaled,
            "est_distinct": est, "n_seen": n}])

    return keyed_process(df, keys, fn, out_schema,
                         output_mode="update")
