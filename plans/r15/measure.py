"""Round-15 measurement harness: best-of-N cold-cache timing + a
formatted-explain dump for a list of registry queries. Mirrors the
bench methodology (count() action, _release_persisted between runs).

Usage: python plans/r15/measure.py [--plans] name [name ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_RUNS (default 3)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from bench import _release_persisted  # noqa: E402
from flink_1_11_2_with_comments_spark import queries as q  # noqa: E402
from flink_1_11_2_with_comments_spark.session import (  # noqa: E402
    DEFAULT_SF_DIR, get_spark)


def main() -> None:
    args = sys.argv[1:]
    dump_plans = "--plans" in args
    suffix = "_before"
    if "--after" in args:
        suffix = "_after"
        args.remove("--after")
    if dump_plans:
        args.remove("--plans")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("r15-measure")
    specs = q.all_specs()
    # warm the JVM + file listing once
    specs[names[0]].fn(spark, sf_dir).count()
    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        spark.sparkContext.setJobDescription(f"r15:{name}")
        if dump_plans:
            df = specs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(here, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        _release_persisted(spark)
        took = []
        for _ in range(runs):
            _release_persisted(spark)
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            took.append(time.perf_counter() - t0)
        print(f"{name}: best {min(took):.3f}  runs "
              f"{[round(t, 3) for t in took]}  rows {n}", flush=True)


if __name__ == "__main__":
    main()
