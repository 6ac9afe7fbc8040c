"""Streaming KMV (k-minimum-values / theta) distinct sketch — the
min-k-merge member of the mergeable keyed-state family (max-merge HLL
in hll.py, sum-merge count-min in cms.py, GK quantiles, Misra-Gries).

Reference shape: per-key accumulator state (GroupAggFunction
ValueState); the accumulator is the sorted list of the k smallest
DISTINCT 60-bit md5 hashes seen — min-k is order-independent and
idempotent (re-delivery of a hash changes nothing), so the drained
sketch is bit-equal to the batch events_kmv_distinct_union estimate
at any micro-batching and under out-of-order replay
(tests/test_stateful.py::test_streaming_kmv_parity).

State per key: at most k hashes — constant. While fewer than k
distinct hashes have been seen, the sketch IS the exact distinct set
(len(mins) < k ⇔ distinct-so-far == len(mins)), so the below-k exact
path needs no extra state. Estimate mirrors the batch query: exact
count below k, else (k-1) * 2^60 / h_k rounded 4dp HALF_UP (Python
round() is banker's and would diverge).
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import DataFrame

from ._hash import md5_60bit_distinct
from .state import KeyedState, keyed_process

_Q4 = decimal.Decimal("1e-4")


def kmv_estimate(mins: list[int], k: int = 16) -> float:
    """Estimate from the min-k sketch — identical arithmetic to the
    batch query (double division, round HALF_UP 4dp)."""
    if len(mins) < k:
        return float(len(mins))
    return float(decimal.Decimal(
        (k - 1.0) * 1152921504606846976.0 / float(mins[k - 1]))
        .quantize(_Q4, rounding=decimal.ROUND_HALF_UP))


def kmv_distinct_stream(df: DataFrame, keys: list[str],
                        value_col: str, k: int = 16) -> DataFrame:
    """Per-key streaming min-k distinct sketch. Emits (key, n_sketch,
    est_distinct, n_seen) per touched key per micro-batch; n_sketch
    is the sketch fill (== exact distinct count while < k)."""
    key_fields = ", ".join(f"{c} string" for c in keys)
    out_schema = (f"{key_fields}, n_sketch int, "
                  f"est_distinct double, n_seen bigint")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None or len(rows) == 0:
            return None
        mins = state.get("mins", [])
        n = state.get("n", 0) + len(rows)
        changed = False
        s = set(mins)
        # the min-k set is a function of the DISTINCT hash multiset:
        # hash once per distinct batch value (C-level unique pass),
        # identical sketch to the per-row loop (round-9)
        for hv in md5_60bit_distinct(rows[value_col]):
            if hv not in s and (len(mins) < k or hv < mins[-1]):
                s.add(hv)
                changed = True
        if changed:
            mins = sorted(s)[:k]
        state.put("mins", mins)
        state.put("n", n)
        return pd.DataFrame([{
            **{c: str(key[i]) for i, c in enumerate(keys)},
            "n_sketch": len(mins),
            "est_distinct": kmv_estimate(mins, k),
            "n_seen": n}])

    return keyed_process(df, keys, fn, out_schema,
                         output_mode="update")
