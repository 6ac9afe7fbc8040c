"""Complex event processing / MATCH_RECOGNIZE — SURVEY §2.9.

Reference: flink-libraries/flink-cep (CEP.java:29, Pattern.java:50 —
where/followedBy/next/times/within), SQL MATCH_RECOGNIZE
(StreamExecMatch.scala:68, rt/match/). The reference compiles a
pattern to an NFA evaluated per key over the ordered stream.

Spark mapping: no native equivalent → NFA over per-key time-ordered
events. Batch: applyInPandas per key (events for one key fit in one
Arrow batch at sane key cardinality; a 100 TB run partitions by key
first, which is the same contract the reference has — CEP state is
per key). Streaming: keyed stateful op buffering events until the
watermark passes, then running the same NFA on the watermark-complete
prefix (event-time-correct, late events beyond the watermark dropped
exactly like the reference's within-window pruning).

Semantics implemented: relaxed contiguity (followedBy), optional
``within`` window, all-matches emission (every combination that
satisfies the pattern — the oracle-checkable semantics; Flink's
after-match skip strategies are selection policies layered on top).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

from .state import KeyedState, keyed_process


@dataclasses.dataclass
class Step:
    """One pattern step: Pattern.begin/.followedBy + .where."""
    name: str
    predicate: Callable[[dict], bool]


def _find_matches(events: list[dict], steps: list[Step], ts_col: str,
                  within_ms: int | None) -> list[list[dict]]:
    """All relaxed-contiguity matches of steps over time-ordered events."""
    matches: list[list[dict]] = []
    n = len(steps)

    def extend(partial: list[dict], next_idx: int, step_i: int) -> None:
        if step_i == n:
            matches.append(partial)
            return
        first_ts = partial[0][ts_col] if partial else None
        for j in range(next_idx, len(events)):
            ev = events[j]
            if first_ts is not None and within_ms is not None:
                if (ev[ts_col] - first_ts).total_seconds() * 1000 > within_ms:
                    break  # events sorted: nothing later can qualify
            if steps[step_i].predicate(ev):
                extend(partial + [ev], j + 1, step_i + 1)

    extend([], 0, 0)
    return matches


def match_recognize_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    steps: list[Step],
    within: str | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Batch MATCH_RECOGNIZE: emit one row per match with the matched
    event ids and the match's start/end timestamps."""
    within_ms = _interval_ms(within) if within else None
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    id_fields = ", ".join(f"{s.name}_id bigint" for s in steps)
    out_schema = f"{key_fields}, {id_fields}, start_ts timestamp, end_ts timestamp"

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        events = pdf.to_dict("records")
        out = []
        for m in _find_matches(events, steps, ts_col, within_ms):
            row = {k: m[0][k] for k in keys}
            for s, ev in zip(steps, m):
                row[f"{s.name}_id"] = ev[id_col]
            row["start_ts"] = m[0][ts_col]
            row["end_ts"] = m[-1][ts_col]
            out.append(row)
        cols = ([*keys, *[f"{s.name}_id" for s in steps], "start_ts", "end_ts"])
        return pd.DataFrame(out, columns=cols)

    return df.groupBy(*keys).applyInPandas(per_key, out_schema)


def match_recognize_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    steps: list[Step],
    within: str | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: buffer per key until the watermark
    passes, then match on the complete prefix and evict events older
    than the within-window (rt/match NFA state pruning analogue)."""
    within_ms = _interval_ms(within) if within else None
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    id_fields = ", ".join(f"{s.name}_id bigint" for s in steps)
    out_schema = f"{key_fields}, {id_fields}, start_ts timestamp, end_ts timestamp"

    def fn(key, rows: pd.DataFrame | None, state: KeyedState):
        import datetime as dt
        buf = state.get("buf", [])
        emitted = set(map(tuple, state.get("emitted", [])))
        if rows is not None:
            for rec in rows.to_dict("records"):
                buf.append({id_col: int(rec[id_col]),
                            ts_col: rec[ts_col].isoformat(),
                            "__data": {s.name: bool(s.predicate(rec))
                                       for s in steps}})
        buf.sort(key=lambda r: (r[ts_col], r[id_col]))
        events = [{id_col: r[id_col],
                   ts_col: dt.datetime.fromisoformat(r[ts_col]),
                   "__flags": r["__data"]} for r in buf]
        wm = state.watermark_ms()
        complete = [e for e in events
                    if e[ts_col].timestamp() * 1000 <= wm] if wm > 0 else []
        flag_steps = [Step(s.name, lambda ev, n=s.name: ev["__flags"][n])
                      for s in steps]
        out = []
        for m in _find_matches(complete, flag_steps, ts_col, within_ms):
            sig = tuple(ev[id_col] for ev in m)
            if sig in emitted:
                continue
            emitted.add(sig)
            row = {k: key[i] for i, k in enumerate(keys)}
            for s, ev in zip(steps, m):
                row[f"{s.name}_id"] = ev[id_col]
            row["start_ts"] = m[0][ts_col]
            row["end_ts"] = m[-1][ts_col]
            out.append(row)
        # evict: events that can no longer start or join a match
        if within_ms is not None and wm > 0:
            cutoff = wm - within_ms
            buf = [r for r in buf
                   if dt.datetime.fromisoformat(r[ts_col]).timestamp() * 1000
                   >= cutoff]
        state.put("buf", buf)
        state.put("emitted", [list(s) for s in emitted])
        cols = ([*keys, *[f"{s.name}_id" for s in steps], "start_ts", "end_ts"])
        return pd.DataFrame(out, columns=cols) if out else None

    return keyed_process(df, keys, fn, out_schema, output_mode="append",
                         timeout="NoTimeout")


def _interval_ms(interval: str) -> int:
    qty, unit = interval.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60000,
            "minutes": 60000, "hour": 3600000, "hours": 3600000,
            "day": 86400000, "days": 86400000}[unit]
    return int(qty) * mult
