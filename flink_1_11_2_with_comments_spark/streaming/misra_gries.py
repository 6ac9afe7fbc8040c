"""Streaming heavy hitters: the Misra-Gries summary as keyed state.

The streaming counterpart of the batch `heavy_hitters` query: per
stream partition key, maintain at most k counters over an unbounded
stream of items (Misra-Gries 1982; the "space-saving"/"frequent"
family every production stream processor ships). The summary
guarantees, after n items:

- every item with true frequency > n/k IS in the summary
  (no false negatives above the threshold), and
- each reported count undercounts its true frequency by at most
  (n - sum_of_counts)/… ≤ n/k (the classic MG error bound).

Both properties are pinned in tests/test_stateful.py against exact
batch counts. State per key is ONE dict of ≤ k counters — constant
memory however long the stream runs, the property that makes the
operator viable at 100 TB/day ingest (exact streaming counts would
need unbounded per-key maps).

Reference shape: the per-key keyed-state discipline of
KeyedProcessFunction (flink-streaming-java/.../KeyedProcessFunction
.java); Flink users build exactly this operator on ValueState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .state import keyed_process


def misra_gries_stream(df: DataFrame, keys: list[str], item_col: str,
                       k: int = 8) -> DataFrame:
    """Maintain a k-counter Misra-Gries summary per key; emit the
    summary (key, item, est_count, n_processed) each micro-batch in
    UPDATE mode.

    Read pattern: counters evicted by the decrement-all step emit no
    retraction, so "latest row per (key, item)" can show stale items.
    Readers must restrict to rows carrying the key's MAX n_processed
    (the full summary is re-emitted every batch, so that slice is
    exactly the live counter set).
    """
    import pandas as pd

    key_fields = ", ".join(f"{c} string" for c in keys)
    out_schema = (f"{key_fields}, item string, est_count bigint, "
                  f"n_processed bigint")

    def fn(key, rows: pd.DataFrame | None, state):
        if rows is None:
            return None
        counters: dict = dict(state.get("counters", []))
        n = state.get("n", 0)
        for item in rows[item_col]:
            n += 1
            it = str(item)
            if it in counters:
                counters[it] += 1
            elif len(counters) < k:
                counters[it] = 1
            else:
                # decrement-all step: every counter pays one
                for c in list(counters):
                    counters[c] -= 1
                    if counters[c] == 0:
                        del counters[c]
        state.put("counters", list(counters.items()))
        state.put("n", n)
        return pd.DataFrame(
            [{**{c: str(key[i]) for i, c in enumerate(keys)},
              "item": it, "est_count": cnt, "n_processed": n}
             for it, cnt in counters.items()])

    return keyed_process(df, keys, fn, out_schema,
                         output_mode="update")
