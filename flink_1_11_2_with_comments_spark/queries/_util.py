"""Shared helpers for the query registry.

Numeric determinism
-------------------
The driver hash-compares Spark results against a DuckDB oracle.
Double-precision SUM/AVG are order-dependent, and Spark's merge order
varies run to run, so we make money-aggregates exact by accumulating
in DECIMAL (order-independent, both engines), ROUNDING the exact sum
to a small scale, and only then casting to DOUBLE:

    Spark : F.round(F.sum(expr.cast("decimal(30,10)")), 2).cast("double")
    oracle: CAST(ROUND(SUM(CAST(expr AS DECIMAL(30,10))), 2) AS DOUBLE)

The ROUND matters: DuckDB's decimal→double conversion is a scaled-
integer divide that is only correctly rounded when the scaled integer
fits in 2^53; rounding to scale ≤6 keeps it there, making both
engines' final cast bit-identical (verified empirically on sf0.01).
The reference solves the equivalent problem with tolerance instead
(TpcdsResultComparator.java:54 allows abs 0.01); we get bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(expr: Column | str, scale: int = 2) -> Column:
    """Order-independent, engine-exact sum of a double expression."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent, engine-exact average of a double expression."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return (F.round(F.sum(c.cast(DEC)), 6).cast("double") / F.count(c))


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,10))), {scale}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (f"(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,10))), 6) AS DOUBLE)"
            f" / COUNT({expr}))")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..catalog import load_table
    return load_table(spark, sf_dir, name)
