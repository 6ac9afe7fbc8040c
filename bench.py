"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_11_2_with_comments_spark import queries as q
from flink_1_11_2_with_comments_spark.session import DEFAULT_SF_DIR, get_spark

# Headline set: relational core + heavy joins/aggs + window/streaming
# semantics + pipeline ops — one representative per operator family.
HEADLINE = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10",
    "tpch_q13", "tpch_q18", "tpch_q21",
    "join_inner_shuffle", "agg_grouping_sets",
    "over_rows_unbounded_preceding", "rank_topn_per_group",
    "window_hop_agg", "window_session_agg", "interval_join_batch",
    "asof_join_batch",
    "dedup_minhash_lsh", "dedup_simhash", "text_fingerprint",
    "ann_bruteforce_topk", "ann_ivf_lloyd",
    "cep_quantified", "changelog_rowkind", "evictor_count_window",
    "graph_connected_components", "approx_sketches",
    "pipeline_end_to_end",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = q.all_specs()
    names = [n for n in HEADLINE if n in specs]
    # warm the JVM + file listing once so timings measure query execution
    specs[names[0]].fn(spark, sf_dir).count()

    # best-of-2 per query: the second run measures steady state (no
    # Python-worker spinup / first-use JIT), the min is the stable
    # figure for round-over-round comparison
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            n = df.count()  # full materialization of the result
            took = time.perf_counter() - t0
            best = took if best is None or took < best else best
            assert n >= 0
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
