"""Table API (fluent) facade — SURVEY §3.2.

Reference: flink-table/flink-table-api-java/.../Table.java:106-1072 —
the fluent relational surface (select/filter/groupBy/join/orderBy/
fetch/offset/union/minus/intersect/window). Each call there builds an
Operation tree handed to the planner; a PySpark DataFrame call builds
the identical unresolved logical plan, so this facade is a thin
name-for-name mapping with PyFlink's snake_case spellings. Expressions
are Spark Columns or SQL strings (parsed via F.expr — the analogue of
the reference's expression DSL parser, ExpressionParser.java).

Citations per method are to Table.java line numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(exprs):
    return [e if isinstance(e, Column) else F.expr(e) for e in exprs]


class Table:
    """Fluent Table over a DataFrame (Table.java:106)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- bridge -----------------------------------------------------
    def to_df(self) -> DataFrame:
        """toDataStream/toDataSet bridge — the DataFrame IS the bridge."""
        return self._df

    def execute(self) -> DataFrame:
        """Table.execute (:1292 in api) — Spark stays lazy; collect()
        on the returned DataFrame materializes."""
        return self._df

    # -- row-level --------------------------------------------------
    def select(self, *exprs) -> "Table":          # Table.java:126
        return Table(self._df.select(*_cols(exprs)))

    def filter(self, predicate) -> "Table":        # Table.java:186
        p = predicate if isinstance(predicate, Column) else F.expr(predicate)
        return Table(self._df.where(p))

    where = filter                                 # Table.java:166

    def add_columns(self, *exprs) -> "Table":      # Table.java:251
        return Table(self._df.select("*", *_cols(exprs)))

    def rename_columns(self, *pairs: str) -> "Table":   # Table.java:295
        """rename_columns("a AS b", ...)"""
        df = self._df
        for p in pairs:
            old, new = [s.strip() for s in p.split(" AS ")]
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *names: str) -> "Table":     # Table.java:318
        return Table(self._df.drop(*names))

    # -- grouping ---------------------------------------------------
    def group_by(self, *exprs) -> "GroupedTable":  # Table.java:340
        return GroupedTable(self._df, _cols(exprs))

    def distinct(self) -> "Table":                 # Table.java:360
        return Table(self._df.distinct())

    # -- joins ------------------------------------------------------
    def join(self, right: "Table", on=None) -> "Table":      # :384
        return self._join(right, on, "inner")

    def left_outer_join(self, right: "Table", on=None) -> "Table":  # :441
        return self._join(right, on, "left")

    def right_outer_join(self, right: "Table", on) -> "Table":      # :478
        return self._join(right, on, "right")

    def full_outer_join(self, right: "Table", on) -> "Table":       # :515
        return self._join(right, on, "full")

    def _join(self, right, on, how):
        if on is None:
            return Table(self._df.crossJoin(right._df))
        cond = on if isinstance(on, Column) else F.expr(on)
        return Table(self._df.join(right._df, cond, how))

    # -- set operations (Table.java:830-917) ------------------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionAll(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    # -- sort / limit (Table.java:934-1002) -------------------------
    def order_by(self, *exprs) -> "Table":
        return Table(self._df.orderBy(*_cols(exprs)))

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    def limit(self, n: int) -> "Table":
        return Table(self._df.limit(n))


class GroupedTable:
    """GroupedTable.select — aggregate per group (Table.java:340 →
    GroupedTable.java)."""

    def __init__(self, df: DataFrame, keys: list[Column]):
        self._df = df
        self._keys = keys

    def select(self, *agg_exprs) -> Table:
        return Table(self._df.groupBy(*self._keys).agg(*_cols(agg_exprs)))
