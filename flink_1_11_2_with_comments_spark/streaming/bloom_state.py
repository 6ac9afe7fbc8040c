"""Streaming Bloom-filter build — the union-merge member of the
mergeable keyed-state sketch family (max-merge HLL, min-k KMV,
sum-merge CMS, GK quantiles, Misra-Gries counters).

Reference shape: per-key accumulator state (GroupAggFunction
ValueState, same as the other twins); the accumulator is the SET of
bit positions touched so far. Set-union is order-independent and
idempotent (re-delivery of a value flips nothing), so the drained
filter is bit-equal to the batch pipeline/bloom.bloom_build at any
micro-batching and under out-of-order replay
(tests/test_stateful.py::test_streaming_bloom_parity) — which is what
lets a 100 TB ingest pipeline maintain its dedup prefilter
INCREMENTALLY (per epoch, per source shard) instead of rebuilding it
from history: new batch arrives → positions union into state → the
drained position set IS the filter the next epoch's probes broadcast.

State per key: at most m_bits small ints — constant, the Bloom
guarantee. Position hashing mirrors pipeline/bloom.bloom_positions
exactly (md5 of "i:" || value, first 15 hex chars as int, mod m) so
the streaming and batch filters agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


def bloom_positions_py(value: str, m_bits: int, k: int) -> list[int]:
    """Python mirror of pipeline/bloom.bloom_positions — identical
    salted md5 → 60-bit int → mod m arithmetic."""
    return [int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15],
                16) % m_bits for i in range(k)]


def positions_digest(positions: set[int] | list[int]) -> str:
    """Canonical digest of a position set (md5 of the sorted
    comma-joined list) — the compact bit-equality witness the parity
    test compares between the streamed and batch-built filters."""
    return hashlib.md5(
        ",".join(str(p) for p in sorted(set(positions)))
        .encode()).hexdigest()


def bloom_build_stream(df: DataFrame, keys: list[str], value_col: str,
                       m_bits: int = 2048, k: int = 2) -> DataFrame:
    """Per-key streaming Bloom build: union the k bit positions of
    every arriving value into keyed state, emit (key, n_positions,
    positions_md5, n_seen) per touched key per micro-batch. The
    final emission's positions_md5 equals the batch filter's digest
    (drain parity), and n_positions / m_bits is the live fill ratio
    a deployment watches to trigger re-sharding before the
    false-positive rate degrades."""
    key_fields = ", ".join(f"{c} string" for c in keys)
    out_schema = (f"{key_fields}, n_positions int, "
                  f"positions_md5 string, n_seen bigint")

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        if rows is None or len(rows) == 0:
            return None
        pos = set(state.get("pos", []))
        n = state.get("n", 0) + len(rows)
        # the position set is a function of the DISTINCT value set:
        # hash once per distinct batch value (the sketch-family
        # C-level unique-pass discipline)
        for v in pd.unique(rows[value_col]):
            pos.update(bloom_positions_py(str(v), m_bits, k))
        state.put("pos", sorted(pos))
        state.put("n", n)
        return pd.DataFrame([{
            **{c: str(key[i]) for i, c in enumerate(keys)},
            "n_positions": len(pos),
            "positions_md5": positions_digest(pos),
            "n_seen": n}])

    return keyed_process(df, keys, fn, out_schema,
                         output_mode="update")
