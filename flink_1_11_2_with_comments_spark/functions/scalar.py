"""Flink scalar built-ins that Spark doesn't ship under the same name
or semantics — SURVEY §2.8.

Reference: BuiltInFunctionDefinitions.java (137 definitions),
FlinkSqlOperatorTable.java custom-function block; runtime impls
SqlFunctionUtils.java:64 and SqlDateTimeUtils.java:66.

Implementation strategy (scale-first): every function here is either
(a) a Column combinator over pyspark.sql.functions — stays inside
whole-stage codegen, zero Python at runtime — or (b) a SQL UDF
(CREATE TEMPORARY FUNCTION ... RETURN expr, Spark 4), which Catalyst
inlines into the plan. NO row-at-a-time Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Column combinators (Flink name → Spark expression)
# ---------------------------------------------------------------------------


def split_index(s: Column | str, delim: str, idx: int) -> Column:
    """SPLIT_INDEX(str, sep, index) — 0-based, NULL when out of range.

    Reference: SqlFunctionUtils.java splitIndex (rt functions).
    element_at is 1-based, hence idx+1; element_at returns NULL for
    out-of-bounds array access under non-ANSI mode, matching Flink.
    """
    c = F.col(s) if isinstance(s, str) else s
    return F.get(F.split(c, delim), idx)


def is_decimal(s: Column | str) -> Column:
    """IS_DECIMAL(str): parseable as a number. SqlFunctionUtils.isDecimal."""
    c = F.col(s) if isinstance(s, str) else s
    return c.rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def is_digit(s: Column | str) -> Column:
    """IS_DIGIT(str): all characters are digits."""
    c = F.col(s) if isinstance(s, str) else s
    return c.rlike(r"^\d+$")


def is_alpha(s: Column | str) -> Column:
    """IS_ALPHA(str): all characters are letters."""
    c = F.col(s) if isinstance(s, str) else s
    return c.rlike(r"^[A-Za-z]+$")


def hash_code(s: Column | str) -> Column:
    """HASH_CODE(str) — Java String.hashCode (s[0]*31^(n-1) + ...).

    Reference: SqlFunctionUtils.hashCode. Implemented as an aggregate
    over the char codes so it stays JVM-side; exact Java semantics
    (32-bit overflow) via int casts.
    """
    c = F.col(s) if isinstance(s, str) else s
    # fold over characters: h = 31*h + code, with 32-bit wraparound
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch)),
        F.lit(0),
        lambda acc, x: (acc * 31 + x).cast("int"),
    )


def rand_integer(n: int, seed: int | None = None) -> Column:
    """RAND_INTEGER(n): uniform int in [0, n)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * n).cast("int")


def temporal_overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """TEMPORAL_OVERLAPS — (s1,e1) overlaps (s2,e2).

    Reference: BuiltInFunctionDefinitions TEMPORAL_OVERLAPS; SQL
    standard OVERLAPS: intervals share at least one point.
    """
    lo1, hi1 = F.least(s1, e1), F.greatest(s1, e1)
    lo2, hi2 = F.least(s2, e2), F.greatest(s2, e2)
    return (lo1 <= hi2) & (lo2 <= hi1)


def to_base64(c: Column | str) -> Column:
    """TO_BASE64 → base64 (same RFC 4648)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.base64(col.cast("binary"))


def from_base64(c: Column | str) -> Column:
    """FROM_BASE64 → unbase64, result as string (Flink returns STRING)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unbase64(col).cast("string")


def regexp(c: Column | str, pattern: str) -> Column:
    """Flink REGEXP(str, pattern) → rlike (partial match semantics)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike(pattern)


# ---------------------------------------------------------------------------
# SQL UDF registration: Flink-named functions callable from spark.sql()
# ---------------------------------------------------------------------------

_SQL_UDFS: dict[str, str] = {
    # name: (args) RETURNS type RETURN body
    "SPLIT_INDEX": ("(s STRING, sep STRING, idx INT) RETURNS STRING "
                    "RETURN get(split(s, sep), idx)"),
    "IS_DECIMAL": ("(s STRING) RETURNS BOOLEAN RETURN "
                   r"s RLIKE '^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$'"),
    "IS_DIGIT": r"(s STRING) RETURNS BOOLEAN RETURN s RLIKE '^\\d+$'",
    "IS_ALPHA": r"(s STRING) RETURNS BOOLEAN RETURN s RLIKE '^[A-Za-z]+$'",
    "RAND_INTEGER": ("(n INT) RETURNS INT RETURN "
                     "CAST(floor(rand() * n) AS INT)"),
    "TO_BASE64": "(s STRING) RETURNS STRING RETURN base64(CAST(s AS BINARY))",
    "FROM_BASE64": "(s STRING) RETURNS STRING RETURN CAST(unbase64(s) AS STRING)",
}


def register_sql_functions(spark: SparkSession) -> None:
    """Register Flink-named scalar functions as Spark SQL UDFs.

    SQL UDFs are inlined by Catalyst (no UDF call overhead at all),
    so spark.sql("SELECT SPLIT_INDEX(...)") plans identically to the
    hand-written expression — the Flink SQL surface at zero cost.
    """
    for name, sig in _SQL_UDFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig}")
