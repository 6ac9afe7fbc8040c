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
x.<rowtime>` is routed by event_time_temporal_join below to the
as-of operator (streaming/asof.asof_join) — the reference rewrites
this exact syntax to its event-time temporal join
(flink-table-planner-blink/.../rules/logical/
LogicalCorrelateToJoinFromTemporalTableRule.scala:1, executed by
TemporalRowTimeJoinOperator.java:72; TemporalJoinITCase pins the SQL
form). No SQL-only rewrite is correct for it, so translate_flink_sql
still raises when handed one directly. MATCH_RECOGNIZE is parsed by
plans/match_recognize.py (routed from TableEnvironment.sql_query),
not here.
"""

from __future__ import annotations

import itertools
import re

_TEMPORAL_VIEW_SEQ = itertools.count()

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

# event-time versioned-table join, the documented subset: one aliased
# probe table, one versioned table, AND-combined equi ON, optional
# trailing WHERE
_SYSTEM_TIME_EVENT = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+"
    r"FROM\s+(?P<ltab>\w+)\s+(?:AS\s+)?(?P<la>(?!LEFT\b|JOIN\b)\w+)\s+"
    r"(?P<outer>LEFT\s+)?JOIN\s+(?P<rtab>\w+)\s+"
    r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<lqa>\w+)\.(?P<lts>\w+)\s+"
    r"(?:AS\s+)?(?P<ra>\w+)\s+"
    r"ON\s+(?P<on>.+?)(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def event_time_temporal_join(spark, sql: str):
    """Route event-time `JOIN v FOR SYSTEM_TIME AS OF probe.rowtime`
    to streaming/asof.asof_join — the rewrite the reference planner
    performs (LogicalCorrelateToJoinFromTemporalTableRule.scala:1 →
    TemporalRowTimeJoinOperator.java:72). Returns None when the
    statement is not an event-time temporal join (the caller falls
    through to the plain dialect translation); raises
    NotImplementedError for shapes outside the documented subset.

    The versioned side's rowtime comes from its DDL watermark
    (catalog.WATERMARKS) when declared, else its unique timestamp
    column — mirroring Flink, where the versioned table's event-time
    attribute is table metadata, never spelled in the join clause.
    INNER drops probe rows with no preceding version; LEFT keeps them
    with NULL payloads (both per TemporalJoinITCase).
    """
    m = _SYSTEM_TIME_EVENT.match(sql)
    if m is None:
        return None
    if m["lts"].lower() in ("proctime", "proc_time"):
        return None  # proc-time form: erased to a plain join instead
    from ..catalog import WATERMARKS
    from ..streaming.asof import asof_join

    la, ra = m["la"], m["ra"]
    if m["lqa"] != la:
        raise NotImplementedError(
            f"AS OF must reference the probe alias {la!r}, "
            f"got {m['lqa']!r}")
    left = spark.table(m["ltab"])
    right = spark.table(m["rtab"])

    keys = []
    for cond in re.split(r"\s+AND\s+", m["on"].strip(), flags=re.I):
        cm = re.fullmatch(r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)",
                          cond.strip())
        if cm is None:
            raise NotImplementedError(
                f"temporal join ON supports AND-ed equi conditions "
                f"alias.col = alias.col, got {cond!r}")
        (a1, c1), (a2, c2) = (cm.group(1), cm.group(2)), \
            (cm.group(3), cm.group(4))
        if {a1, a2} != {la, ra}:
            raise NotImplementedError(
                f"ON condition must relate {la!r} to {ra!r}: {cond!r}")
        keys.append((c1, c2) if a1 == la else (c2, c1))

    # versioned side's event-time attribute: DDL watermark, else the
    # single timestamp-typed column
    right_ts = WATERMARKS.get(m["rtab"], (None, None))[0]
    if right_ts is None or right_ts not in right.columns:
        ts_cols = [f.name for f in right.schema.fields
                   if f.dataType.simpleString().startswith("timestamp")]
        if len(ts_cols) != 1:
            raise NotImplementedError(
                f"versioned table {m['rtab']!r} needs a WATERMARK "
                f"declaration or exactly one timestamp column, "
                f"found {ts_cols}")
        right_ts = ts_cols[0]

    # align right key names to the probe side's
    for lk, rk in keys:
        if rk != lk:
            right = right.withColumnRenamed(rk, lk)
    on = [lk for lk, _ in keys]
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = [c for c in payload if c in left.columns]
    if clash:
        raise NotImplementedError(
            f"non-key columns shared by both sides: {clash} — alias "
            f"them apart in views first")

    joined = asof_join(
        left, right, on=on, left_ts=m["lts"], right_ts=right_ts,
        right_payload=payload,
        how="left" if m["outer"] else "inner")
    strip = re.compile(rf"\b(?:{re.escape(la)}|{re.escape(ra)})\.")
    # unique per call: a fixed name would clobber a user view of the
    # same name and is unsafe for two concurrent temporal-join plans
    # in one session
    view = f"__temporal_join_probe_build_{next(_TEMPORAL_VIEW_SEQ)}"
    joined.createOrReplaceTempView(view)
    try:
        q = f"SELECT {strip.sub('', m['select'])} FROM {view}"
        if m["where"]:
            q += f" WHERE {strip.sub('', m['where'])}"
        out = spark.sql(q)
    finally:
        spark.catalog.dropTempView(view)
    return out


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
            "event-time temporal table syntax has no SQL-only rewrite:"
            " go through TableEnvironment.sql_query (which routes it to"
            " event_time_temporal_join) or streaming.asof.asof_join")

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
