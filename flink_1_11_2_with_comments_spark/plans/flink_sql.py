"""Flink-SQL dialect front-end: group-window syntax → Spark SQL.

The reference's SQL surface includes group-window functions in GROUP
BY (FlinkSqlOperatorTable.java:778-810):

    GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
    SELECT TUMBLE_START(ts, INTERVAL '1' HOUR), ...

Spark expresses the same thing as window(ts, '1 hour') + window.start.
Per SURVEY §7 (M3 decision), a lightweight SQL-rewrite front-end is
simpler and more robust than Catalyst extensions — this module is
that rewrite: a token-level translation of the window constructs,
leaving everything else to Spark's parser.

Handled: TUMBLE/HOP/SESSION in GROUP BY, their _START/_END
auxiliaries in SELECT, PROCTIME() → current_timestamp(), and the
lookup-join clause `FOR SYSTEM_TIME AS OF x.proctime` (the proc-time
temporal join, StreamExecLookupJoin.scala:38 — joining against the
dimension's CURRENT version, which in micro-batch Spark is exactly
the stream-static join over the table as-read this batch, so the
clause erases to a plain join). Event-time `FOR SYSTEM_TIME AS OF
x.<rowtime>` still raises: point-in-time versioned semantics need
streaming/asof.asof_join (no SQL-only rewrite is correct for it).
MATCH_RECOGNIZE is parsed by plans/match_recognize.py (routed from
TableEnvironment.sql_query), not here.
"""

from __future__ import annotations

import re

_INTERVAL = r"INTERVAL\s+'([^']+)'\s+(\w+)"


def _iv(qty: str, unit: str) -> str:
    unit = unit.lower()
    if not unit.endswith("s"):
        unit += "s"
    return f"{qty} {unit}"


# `FOR SYSTEM_TIME AS OF o.proctime` / `... AS OF PROCTIME()`
_SYSTEM_TIME_PROC = re.compile(
    r"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?:\w+\.(?:proctime|proc_time)\b|PROCTIME\s*\(\s*\))",
    re.IGNORECASE)


def translate_flink_sql(sql: str) -> str:
    """Rewrite Flink group-window SQL into Spark SQL."""
    up = sql.upper()
    if "MATCH_RECOGNIZE" in up:
        raise NotImplementedError(
            "MATCH_RECOGNIZE: TableEnvironment.sql_query routes it to "
            "plans.match_recognize; direct API: streaming.cep")

    # proc-time lookup join: join against the current version = plain join
    out = _SYSTEM_TIME_PROC.sub("", sql)
    if "FOR SYSTEM_TIME AS OF" in out.upper():
        raise NotImplementedError(
            "event-time temporal table syntax: use streaming.asof.asof_join")

    # auxiliaries first (longer tokens): TUMBLE_START(ts, INTERVAL..)
    # etc. *_ROWTIME is the window's event-time attribute = end − 1ms
    # (Flink returns the max timestamp INSIDE the window —
    # FlinkSqlOperatorTable.java:778-810 TUMBLE_ROWTIME et al.)
    for fn, win_args, field in [
        ("TUMBLE_START", 2, "start"), ("TUMBLE_END", 2, "end"),
        ("TUMBLE_ROWTIME", 2, "rowtime"),
        ("HOP_START", 3, "start"), ("HOP_END", 3, "end"),
        ("HOP_ROWTIME", 3, "rowtime"),
        ("SESSION_START", 2, "start"), ("SESSION_END", 2, "end"),
        ("SESSION_ROWTIME", 2, "rowtime"),
    ]:
        pattern = re.compile(
            rf"{fn}\s*\(\s*(\w+)\s*,\s*{_INTERVAL}"
            + (rf"\s*,\s*{_INTERVAL}" if win_args == 3 else "")
            + r"\s*\)", re.IGNORECASE)

        def repl(m, field=field, fn=fn):
            win = "session_window" if fn.startswith("SESSION") else "window"
            if field == "rowtime":
                return f"({win}.end - INTERVAL 1 MILLISECOND)"
            return f"{win}.{field}"

        out = pattern.sub(repl, out)

    # TUMBLE(ts, INTERVAL 'n' UNIT) → window(ts, 'n units')
    out = re.sub(
        rf"TUMBLE\s*\(\s*(\w+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window({m.group(1)}, '{_iv(m.group(2), m.group(3))}')",
        out, flags=re.IGNORECASE)
    # HOP(ts, INTERVAL slide, INTERVAL size) → window(ts, size, slide)
    out = re.sub(
        rf"HOP\s*\(\s*(\w+)\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)",
        lambda m: (f"window({m.group(1)}, '{_iv(m.group(4), m.group(5))}',"
                   f" '{_iv(m.group(2), m.group(3))}')"),
        out, flags=re.IGNORECASE)
    # SESSION(ts, INTERVAL gap) → session_window(ts, 'gap')
    out = re.sub(
        rf"SESSION\s*\(\s*(\w+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: (f"session_window({m.group(1)},"
                   f" '{_iv(m.group(2), m.group(3))}')"),
        out, flags=re.IGNORECASE)
    # PROCTIME() → current_timestamp() (micro-batch approximation)
    out = re.sub(r"PROCTIME\s*\(\s*\)", "current_timestamp()", out,
                 flags=re.IGNORECASE)
    return out
