"""OVER aggregates, ranking, TopN, deduplication — SURVEY §2.5.

Reference operators:
- batch OVER frames:   BatchExecOverAggregate.scala:73 + rt/over/frame/*
- ranking functions:   FlinkSqlOperatorTable.java:1000-1004
- TopN:                BatchExecRank.scala:56 / StreamExecRank.scala:52
- deduplicate:         StreamExecDeduplicateRule.scala:57 (ROW_NUMBER=1 rewrite)

Determinism notes: every window ORDER BY includes a unique tiebreaker
so rank/lead/lag are well-defined; windowed double sums accumulate in
DECIMAL because engines use different evaluation trees (Spark running
accumulation vs DuckDB segment tree) whose FP rounding differs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import register
from ._util import t

DEC = "decimal(30,10)"


@register(
    "over_rows_unbounded_preceding",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS DOUBLE) AS running_rev
    FROM lineitem WHERE l_suppkey <= 5
    """,
    doc="Running total: ROWS UNBOUNDED PRECEDING → rt/over/frame/"
        "UnboundedPrecedingOverFrame analogue.",
)
def over_rows_unbounded_preceding(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 5)
    w = (W.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.sum(F.col("l_extendedprice").cast(DEC)).over(w), 2)
        .cast("double").alias("running_rev"))


@register(
    "over_rows_sliding",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(30,10)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber
                   ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING), 6)
             AS DOUBLE) AS sliding_avg
    FROM lineitem WHERE l_suppkey <= 5
    """,
    doc="Sliding ROWS frame (3 PRECEDING..1 FOLLOWING) → "
        "rt/over/frame/RowSlidingOverFrame.java.",
)
def over_rows_sliding(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 5)
    w = (W.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
         .rowsBetween(-3, 1))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.avg(F.col("l_quantity").cast(DEC)).over(w), 6)
        .cast("double").alias("sliding_avg"))


@register(
    "over_range_bounded",
    """
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
             AS near_orders
    FROM orders WHERE o_custkey <= 50
    """,
    doc="RANGE frame over a numeric key → rt/over/frame/"
        "RangeSlidingOverFrame.java; value-based, not row-based.",
)
def over_range_bounded(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w = (W.partitionBy("o_custkey").orderBy("o_orderkey")
         .rangeBetween(-100, W.currentRow))
    return o.select("o_orderkey", "o_custkey",
                    F.count("*").over(w).alias("near_orders"))


@register(
    "over_unbounded_following",
    """
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2)
             AS DOUBLE) AS remaining_value
    FROM orders WHERE o_custkey <= 50
    """,
    doc="CURRENT ROW..UNBOUNDED FOLLOWING frame → "
        "rt/over/frame/UnboundedFollowingOverFrame.java.",
)
def over_unbounded_following(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w = (W.partitionBy("o_custkey").orderBy("o_orderkey")
         .rowsBetween(W.currentRow, W.unboundedFollowing))
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double").alias("remaining_value"))


@register(
    "over_ranking_functions",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           CAST(NTILE(4)  OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST()    OVER w AS cdist
    FROM orders WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Full ranking-function set — FlinkSqlOperatorTable.java:1000-1004. "
        "percent_rank/cume_dist are exact integer ratios → engine-identical.",
)
def over_ranking_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"))


@register(
    "over_lead_lag",
    """
    SELECT event_id, user_id, value,
           LAG(value)            OVER w AS prev_value,
           LEAD(value)           OVER w AS next_value,
           LAG(value, 2, -1.0)   OVER w AS prev2_value,
           FIRST_VALUE(value)    OVER w AS first_val,
           LAST_VALUE(value)     OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING)
             AS last_val
    FROM events WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="LEAD/LAG/FIRST_VALUE/LAST_VALUE — rt/over/frame/OffsetOverFrame.java; "
        "aggfunctions/{LeadLag,FirstValue,LastValue}AggFunction.",
)
def over_lead_lag(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"))


@register(
    "rank_topn_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) ranked
    WHERE rn <= 3
    """,
    doc="TopN per group: ROW_NUMBER ≤ k — BatchExecRank.scala:56 / "
        "RankOperator.java:35; streaming incremental variant is "
        "streaming/topn.py.",
)
def rank_topn_per_group(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (c.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("c_mktsegment", "c_custkey", "c_acctbal", "rn"))


@register(
    "dedup_keep_first_row",
    """
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) d
    WHERE rn = 1
    """,
    doc="Deduplicate keep-first (earliest event per user): ROW_NUMBER=1 "
        "rewrite — StreamExecDeduplicateRule.scala:35-52, "
        "DeduplicateKeepFirstRowFunction.java:36. Streaming equivalent: "
        "dropDuplicates/dropDuplicatesWithinWatermark.",
)
def dedup_keep_first_row(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "event_type"))


@register(
    "dedup_keep_last_row",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) d
    WHERE rn = 1
    """,
    doc="Deduplicate keep-last (latest state per key) — "
        "DeduplicateKeepLastRowFunction.java:36; the changelog/upsert view "
        "of a keyed stream.",
)
def dedup_keep_last_row(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "value"))


@register(
    "over_multi_window",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey,
           ROW_NUMBER() OVER (PARTITION BY l_suppkey
                              ORDER BY l_orderkey, l_linenumber) AS rn_supp,
           COUNT(*) OVER (PARTITION BY l_partkey) AS part_lines
    FROM lineitem WHERE l_suppkey <= 3
    """,
    doc="Two different window partitionings in one query (plan has two "
        "exchange+window stages) — mirrors OverWindowITCase multi-window "
        "cases.",
)
def over_multi_window(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    w1 = W.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    w2 = W.partitionBy("l_partkey")
    return li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        F.row_number().over(w1).alias("rn_supp"),
        F.count("*").over(w2).alias("part_lines"))


@register(
    "over_ignore_nulls",
    """
    WITH m AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS mv
      FROM events WHERE user_id <= 100
    )
    SELECT user_id, event_id, mv,
           LAST_VALUE(mv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_filled,
           FIRST_VALUE(mv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_seen
    FROM m
    """,
    doc="FIRST_VALUE/LAST_VALUE with IGNORE NULLS (gap-filling, "
        "last-observation-carried-forward) — FirstValueWithRetract/"
        "LastValue agg functions' null handling (planner "
        "functions/aggfunctions/FirstValueAggFunction.java).",
)
def over_ignore_nulls(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    m = e.select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value")).alias("mv"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return m.select(
        "user_id", "event_id", "mv",
        F.last("mv", ignorenulls=True).over(w).alias("last_filled"),
        F.first("mv", ignorenulls=True).over(w).alias("first_seen"))


@register(
    "over_time_range_preceding",
    """
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10)))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6)
             AS DOUBLE) AS running_sum
    FROM events WHERE user_id <= 150
    """,
    doc="Time-range-bounded OVER frame: SUM over the trailing hour per "
        "key — the batch twin of the streaming "
        "RowTimeRangeBoundedPrecedingFunction.java:59 operator "
        "(streaming/over_agg.range_bounded_preceding_sum; stream-batch "
        "parity pinned in tests/test_streaming.py). The frame orders by "
        "EXACT integer epoch microseconds on both engines (Spark "
        "timestampdiff from the NTZ epoch — unix_micros would force a "
        "TZ-dependent NTZ→instant cast; DuckDB epoch_us) so the "
        "one-hour boundary never drifts through float rounding; RANGE "
        "frames are peer-inclusive on both. Decimal-accumulated sum "
        "for engine-exact replay.",
)
def over_time_range_preceding(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 150)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = (W.partitionBy("user_id").orderBy(micros)
         .rangeBetween(-3_600_000_000, W.currentRow))
    return e.select(
        "user_id", "event_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 6)
        .cast("double").alias("running_sum"))


@register(
    "temporal_sort_batch",
    """
    SELECT user_id, event_id, ts,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pos
    FROM events WHERE user_id <= 150
    """,
    doc="Temporal sort — the batch twin of the streaming event-time "
        "sorter (RowTimeSortOperator.java:45: buffer until the "
        "watermark, emit in (ts, tiebreak) order). A bare ORDER BY is "
        "unverifiable through an order-insensitive driver hash, so the "
        "sort is attested as a materialized position column: pos is the "
        "row's rank in event-time order per key, which IS the emission "
        "order the streaming operator produces (parity pinned in "
        "tests/test_streaming.py).",
)
def temporal_sort_batch(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 150)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select("user_id", "event_id", "ts",
                     F.row_number().over(w).cast("bigint").alias("pos")))


@register(
    "over_distribution_functions",
    """
    SELECT event_id, event_type,
           CAST(NTILE(4) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS INTEGER)
             AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id), 9)
             AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id), 9)
             AS cume
    FROM events WHERE user_id <= 50
    """,
    doc="Distribution window functions NTILE / PERCENT_RANK / "
        "CUME_DIST — the remaining third of the ranking block "
        "(FlinkSqlOperatorTable.java:1000-1004 registers RANK, "
        "DENSE_RANK, ROW_NUMBER, PERCENT_RANK, CUME_DIST, NTILE; "
        "over_ranking_functions covers the first three). The window "
        "ORDER BY carries the unique event_id tiebreaker so NTILE "
        "bucket boundaries and CUME_DIST peer groups are identical in "
        "both engines; the two fractions are (rank-1)/(n-1) and "
        "peers/n integer ratios, rounded to 9 purely as division "
        "insurance.",
)
def over_distribution_functions(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id", "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"))
