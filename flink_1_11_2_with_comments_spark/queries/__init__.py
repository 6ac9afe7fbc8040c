"""Query registry: every implemented operator gets a named entry with
a Spark implementation and (when SQL-expressible) a DuckDB oracle.

This is the package's equivalent of the reference's ITCase suites
(flink-table-planner-blink/src/test/.../runtime/batch/sql/*ITCase,
stream/sql/*ITCase — SURVEY §5.2): each entry is one operator
exercised end-to-end on the shared fixtures, checked against an
independent SQL engine instead of hand-written expected lists.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add fn(spark, sf_dir) -> DataFrame to the registry."""

    def wrap(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    # import side-effect modules once, here, so the registry is full
    from . import tpch  # noqa: F401
    from . import relational  # noqa: F401
    from . import over_windows  # noqa: F401
    from . import scalar_funcs  # noqa: F401
    from . import streaming_batch  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import udf_surface  # noqa: F401
    from . import graph_ops  # noqa: F401
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v.fn for k, v in all_specs().items()}


def oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
