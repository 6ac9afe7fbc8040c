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


class _WindowDescriptor:
    """Tumble/Slide/Session descriptor — Table API group-window
    surface (Table.window(...) with Tumble.over(...).on(...).alias;
    flink-table-api descriptors Tumble.java/Slide.java/Session.java).
    Sizes are Spark interval strings ('1 hour')."""

    def __init__(self, kind: str, size: str, slide: str | None = None,
                 gap: str | None = None):
        self._kind, self._size, self._slide, self._gap = \
            kind, size, slide, gap
        self._on: str | None = None
        self._name = "w"

    def on(self, ts_col: str) -> "_WindowDescriptor":
        self._on = ts_col
        return self

    def alias(self, name: str) -> "_WindowDescriptor":
        self._name = name
        return self

    def _column(self) -> Column:
        if self._on is None:
            raise ValueError("window descriptor needs .on(ts_col)")
        if self._kind == "session":
            return F.session_window(self._on, self._gap)
        if self._kind == "slide":
            return F.window(self._on, self._size, self._slide)
        return F.window(self._on, self._size)


class Tumble:
    @staticmethod
    def over(size: str) -> _WindowDescriptor:
        return _WindowDescriptor("tumble", size)


class Slide:
    @staticmethod
    def over(size: str):
        d = _WindowDescriptor("slide", size)

        class _Every:
            @staticmethod
            def every(slide: str) -> _WindowDescriptor:
                d._slide = slide
                return d
        return _Every()


class Session:
    @staticmethod
    def with_gap(gap: str) -> _WindowDescriptor:
        return _WindowDescriptor("session", None, gap=gap)


class WindowGroupedTable:
    """table.window(w).group_by(w, keys...).select(aggs) —
    WindowGroupedTable.java."""

    def __init__(self, df: DataFrame, window: _WindowDescriptor,
                 keys: list):
        self._df, self._window, self._keys = df, window, keys

    def select(self, *agg_exprs) -> Table:
        w = self._window
        out = (self._df
               .groupBy(*_cols(self._keys), w._column().alias(w._name))
               .agg(*_cols(agg_exprs))
               .withColumn(f"{w._name}_start", F.col(f"{w._name}.start"))
               .withColumn(f"{w._name}_end", F.col(f"{w._name}.end"))
               .drop(w._name))
        return Table(out)


def _table_window(self: Table, window: _WindowDescriptor):
    class _GB:
        def __init__(self, df):
            self._df = df

        def group_by(self, *keys):
            # the window alias itself may be listed among the keys
            # (Flink's groupBy(w, ...)); drop it — it is implicit
            real = [k for k in keys
                    if not (isinstance(k, str) and k == window._name)]
            return WindowGroupedTable(self._df, window, real)
    return _GB(self._df)


Table.window = _table_window  # Table.java:1050 (window group surface)
