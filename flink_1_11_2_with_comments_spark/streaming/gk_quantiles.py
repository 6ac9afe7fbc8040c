"""Streaming quantiles: the Greenwald-Khanna sketch as keyed state.

The streaming counterpart of the batch percentile queries
(`corpus_length_quantiles`, `events_winsorize_approx`): per stream
partition key, maintain an eps-approximate quantile summary over an
unbounded stream of doubles (Greenwald & Khanna, SIGMOD 2001 — the
summary Flink users build on ValueState for percentile dashboards,
and the algorithm behind most production quantile monitors).

Guarantee (pinned in tests/test_stateful.py against exact sorted
ranks): after n observations, a query for quantile phi returns a
value whose TRUE rank is within eps*n of phi*n. Space is
O((1/eps) * log(eps*n)) tuples per key — the whole point: the exact
answer needs the full value multiset per key, unbounded on an
unbounded stream; GK caps per-key state at a few hundred tuples
however long the stream runs, which is what makes per-key p50/p95/p99
viable at 100 TB/day ingest.

Reference shape: the per-key keyed-state discipline of
KeyedProcessFunction (flink-streaming-java/.../KeyedProcessFunction
.java); same operator skeleton as streaming/misra_gries.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .state import keyed_process

PHIS = (0.1, 0.25, 0.5, 0.75, 0.9)


def gk_insert(tuples: list, v: float, n: int, eps: float) -> None:
    """Insert one value into the summary (list of [v, g, delta] sorted
    by v). n is the count BEFORE this insertion."""
    lo, hi = 0, len(tuples)
    while lo < hi:  # bisect on the value
        mid = (lo + hi) // 2
        if tuples[mid][0] < v:
            lo = mid + 1
        else:
            hi = mid
    if lo == 0 or lo == len(tuples):
        delta = 0  # new min/max must be exact
    else:
        delta = max(math.floor(2 * eps * n) - 1, 0)
    tuples.insert(lo, [v, 1, delta])


def gk_compress(tuples: list, n: int, eps: float) -> None:
    """Merge adjacent tuples while the GK invariant
    g_i + g_{i+1} + delta_{i+1} <= 2*eps*n holds."""
    cap = math.floor(2 * eps * n)
    i = len(tuples) - 2
    while i >= 1:  # never merge away the minimum (index 0)
        g_i = tuples[i][1]
        if g_i + tuples[i + 1][1] + tuples[i + 1][2] <= cap:
            tuples[i + 1][1] += g_i
            del tuples[i]
        i -= 1


def gk_query(tuples: list, phi: float, n: int, eps: float) -> float:
    """eps-approximate phi-quantile: first tuple whose max possible
    rank exceeds target + eps*n, stepped back one."""
    target = max(1, math.ceil(phi * n)) + math.floor(eps * n)
    cum = 0
    for j, (v, g, _d) in enumerate(tuples):
        if cum + g + tuples[j][2] > target:
            return tuples[max(j - 1, 0)][0]
        cum += g
    return tuples[-1][0]


def gk_quantiles_stream(df: DataFrame, keys: list[str], value_col: str,
                        eps: float = 0.05) -> DataFrame:
    """Maintain a GK summary per key; emit the PHIS quantile estimates
    (key, phi, est, n_processed, n_tuples) each micro-batch in UPDATE
    mode. Readers take the rows carrying the key's MAX n_processed
    (the full quantile set is re-emitted every batch)."""
    import pandas as pd

    key_fields = ", ".join(f"{c} string" for c in keys)
    out_schema = (f"{key_fields}, phi double, est double, "
                  f"n_processed bigint, n_tuples int")
    period = max(int(1 / (2 * eps)), 1)  # compress cadence

    def fn(key, rows: pd.DataFrame | None, state):
        # a zero-row (but non-None) batch on a fresh key would leave
        # n=0/tuples empty and gk_query would hit tuples[-1]
        if rows is None or len(rows) == 0:
            return None
        tuples = [list(t) for t in state.get("tuples", [])]
        n = state.get("n", 0)
        for v in rows[value_col]:
            gk_insert(tuples, float(v), n, eps)
            n += 1
            if n % period == 0:
                gk_compress(tuples, n, eps)
        state.put("tuples", tuples)
        state.put("n", n)
        return pd.DataFrame(
            [{**{c: str(key[i]) for i, c in enumerate(keys)},
              "phi": phi, "est": gk_query(tuples, phi, n, eps),
              "n_processed": n, "n_tuples": len(tuples)}
             for phi in PHIS])

    return keyed_process(df, keys, fn, out_schema,
                         output_mode="update")
