"""Streaming running moments — the incremental keyed-state variant of
the batch `embedding_standardize` stats pass (queries/pipeline_ops.py).

Reference shape: a keyed streaming aggregate with per-key accumulators
(flink-table-runtime-blink GroupAggFunction — per-key ValueState
holding the accumulator row, updated per record, emitting the new
aggregate downstream); here the accumulator is (n, Σx, Σx²) per
embedding dimension, so per-dimension mean/σ update as vectors arrive
and the downstream normalize can always use the freshest statistics.

Exactness: the batch form accumulates in DECIMAL(18,10) so results
replay bit-identically in any order. The streaming accumulator mirrors
that — each value is quantized to 10 decimal places (HALF_UP, Spark's
cast rounding) as an exact Python Decimal and summed exactly — so the
final streamed statistics are BIT-EQUAL to the batch aggregate no
matter how the stream is micro-batched (pinned by
tests/test_stateful.py::test_streaming_running_moments_parity).

Scale: state is three numbers per key (dimension) — constant per key,
like any Flink accumulator; the stream shuffles once on the key.
"""

from __future__ import annotations

import decimal
import math

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process

_Q = decimal.Decimal("1e-10")


def _q(x: float) -> decimal.Decimal:
    """Mirror Spark's CAST(double AS DECIMAL(18,10)): exact binary
    value rounded to 10 decimal places, HALF_UP."""
    return decimal.Decimal(x).quantize(_Q, rounding=decimal.ROUND_HALF_UP)


def running_moments(df: DataFrame, key: str = "pos",
                    value: str = "x") -> DataFrame:
    """Keyed streaming running moments: per key, emit the updated
    (n, mu, m2, sigma) after every micro-batch (update semantics —
    the latest row per key is the current statistic).

    mu = Σx/n and m2 = Σx²/n with Σ in exact decimal, then
    sigma = sqrt(m2 - mu²) in double — the identical IEEE ops the
    batch stats pass performs, so streamed and batch statistics agree
    bit-for-bit once the same rows have been consumed.
    """

    def fn(k, rows: pd.DataFrame | None, state: KeyedState):
        # zero-row non-None batch on a fresh key would divide by n=0
        if rows is None or len(rows) == 0:
            return None
        n = state.get("n", 0) + len(rows)
        s = decimal.Decimal(state.get("s", "0"))
        s2 = decimal.Decimal(state.get("s2", "0"))
        for x in rows[value]:
            x = float(x)
            s += _q(x)
            s2 += _q(x * x)
        state.put("n", n)
        state.put("s", str(s))
        state.put("s2", str(s2))
        mu = float(s) / n
        m2 = float(s2) / n
        var = m2 - mu * mu
        # F.sqrt(negative) is NaN, never an error — mirror it
        sigma = math.sqrt(var) if var >= 0 else float("nan")
        return pd.DataFrame(
            [{key: k[0], "n": n, "mu": mu, "m2": m2, "sigma": sigma}])

    return keyed_process(
        df, [key], fn,
        f"{key} int, n bigint, mu double, m2 double, sigma double")
