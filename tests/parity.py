"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set, and
order-insensitive cell values. Comparison is EXACT (stricter than the
driver's hash can be) so that a local pass guarantees a driver pass.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    """Normalize a cell to an engine-independent comparable value."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return f
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (_dt.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:  # numpy array
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    # numpy scalars → python
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, bytes, bool, int)):
        return _norm(v.item())
    return v


def _rows(df_pandas, cols):
    out = []
    for rec in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm(v) for v in rec))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, con, oracle: str, name: str = "?") -> None:
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    assert sp_cols == du_cols, (
        f"{name}: column mismatch spark={sp_cols} oracle={du_cols}")
    assert len(sp) == len(du), (
        f"{name}: row count spark={len(sp)} oracle={len(du)}")
    sp_rows, du_rows = _rows(sp, sp_cols), _rows(du, du_cols)
    bad = 0
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b and not _close(a, b):
            bad += 1
            if bad <= 5:
                print(f"{name} row {i}: spark={a!r} oracle={b!r}")
    assert bad == 0, f"{name}: {bad}/{len(sp_rows)} rows differ"


def _close(a, b) -> bool:
    if type(a) is tuple and type(b) is tuple and len(a) == len(b):
        return all(_close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def assert_exact(spark_df, con, oracle: str, name: str = "?") -> None:
    """Strict variant: floats must match bitwise (what the driver hash needs)."""
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    assert sp_cols == du_cols, f"{name}: cols {sp_cols} vs {du_cols}"
    assert len(sp) == len(du), f"{name}: rows {len(sp)} vs {len(du)}"
    sp_rows, du_rows = _rows(sp, sp_cols), _rows(du, du_cols)
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b]
    assert not diffs, f"{name}: {len(diffs)} exact diffs, first: {diffs[:3]}"
