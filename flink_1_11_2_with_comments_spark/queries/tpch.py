"""TPC-H-style queries adapted to the trimmed testdata schema.

The reference gates correctness on full TPC-H (SF0.01) / TPC-DS (SF1)
answer-file diffs (flink-end-to-end-tests/flink-tpch-test/.../
TpchResultComparator.java:28, flink-tpcds-test/.../TpcdsTestProgram.java:49).
The driver's testdata omits partsupp and several columns, so queries
needing them are adapted in-place (noted per query) while preserving
the operator shape: scan → filter → multi-join → agg → sort/limit,
correlated subqueries, semi/anti joins, grouping.

All implementations are DataFrame-API (Catalyst plans them the same
as SQL); the DuckDB oracle is independent ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from ._util import davg, dsum, sql_davg, sql_dsum, t


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary report: scan→filter→hash agg→sort. "
        "Reference: BatchExecHashAggregate.scala:43 + BatchExecSort.scala:50.",
)
def tpch_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="Shipping priority: 3-way join (dim side broadcast) + agg + top-N. "
        "Adapted: no o_shippriority column. Reference: BatchExecHashJoin.scala:53, "
        "BatchExecSortLimit.scala:52.",
)
def tpch_q3(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is the small side → broadcast, no shuffle of lineitem
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="Local supplier volume: 6-way snowflake join. Dimension chain "
        "(region→nation→supplier/customer) broadcasts; fact tables shuffle on "
        "join keys once. Reference: join reorder LoptOptimizeJoinRule (SURVEY §4.1).",
)
def tpch_q5(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "tpch_q6",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Forecast revenue change: pure scan+filter+global agg — every predicate "
        "pushes to the parquet scan (PushedFilters). Reference: "
        "PushFilterIntoLegacyTableSourceScanRule.scala:45.",
)
def tpch_q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Returned-item reporting: fact-fact join + broadcast dims + top-20. "
        "Adapted: customer address/phone/comment columns absent.",
)
def tpch_q10(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Order priority checking: EXISTS → left-semi join. Adapted: reference "
        "predicate l_commitdate < l_receiptdate (columns absent) becomes "
        "l_shipdate > o_orderdate. Reference: StreamingSemiAntiJoinOperator.java:36 "
        "(batch analogue BatchExecHashJoin semi).",
)
def tpch_q4(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li, (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi")
    return (semi.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="Volume shipping between nation pair: self-join of nation dim under "
        "disjunctive predicate + per-year rollup.",
)
def tpch_q7(spark, sf_dir):
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp")))
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.n1_key)
        .join(F.broadcast(n2), cust.c_nationkey == n2.n2_key)
        .where(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))))
    return (joined
            .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
            .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(dsum("volume").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@register(
    "tpch_q8",
    f"""
    SELECT o_year,
           CAST(ROUND(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                              AS DECIMAL(30,10))), 6) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(volume AS DECIMAL(30,10))), 6) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="National market share: 8-way join + conditional-aggregate ratio. "
        "Adapted: p_type value domain is single words (ECONOMY).",
)
def tpch_q8(spark, sf_dir):
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp")))
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(30,10)"
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n1_key)
        .join(F.broadcast(region), n1.n1_rkey == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.n2_key)
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .withColumn("volume", vol))
    return (joined.groupBy("o_year")
            .agg((F.round(F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume"))
                                .otherwise(0.0).cast(dec)), 6).cast("double")
                  / F.round(F.sum(F.col("volume").cast(dec)), 6).cast("double")
                  ).alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "tpch_q9",
    f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * 0.1 * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="Product-type profit: adapted — partsupp absent, so supply cost is "
        "modeled as 10% of p_retailprice. Same shape: 5-way join, LIKE filter, "
        "two-level group/sort.",
)
def tpch_q9(spark, sf_dir):
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("bigint").alias("o_year"),
                amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year")))


@register(
    "tpch_q12",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Shipping-mode priority counting: adapted — l_shipmode absent, grouped "
        "by l_returnflag instead. Conditional counting via CASE aggregation.",
)
def tpch_q12(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag"))


@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="Customer order-count distribution: left outer join preserving "
        "zero-order customers + double aggregation. Adapted: comment-LIKE "
        "filter replaced by o_orderpriority predicate.",
)
def tpch_q13(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    # aggregate-before-join: collapse orders to (custkey, n) FIRST —
    # map-side partial aggregation shrinks the fact table to customer
    # cardinality before any join shuffle, instead of left-joining raw
    # order rows and re-shuffling the join output to count them
    # (an aggregate pushdown Catalyst does not perform itself);
    # count("o_orderkey") over the left join = 0 on no match =
    # coalesce(n, 0)
    o_cnt = (orders.groupBy("o_custkey")
             .agg(F.count("*").alias("n")))
    return (
        cust.join(o_cnt, cust.c_custkey == o_cnt.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count")))


@register(
    "tpch_q14",
    """
    SELECT 100.00
           * CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                    AS DECIMAL(30,10))), 6) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,10))), 6) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="Promotion effect: conditional-aggregate percentage over a month.",
)
def tpch_q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp")))
    part = t(spark, sf_dir, "part")
    dec = "decimal(30,10)"
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0)
              * F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(0.0).cast(dec)), 6).cast("double")
              / F.round(F.sum(rev.cast(dec)), 6).cast("double")).alias("promo_revenue")))


@register(
    "tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="Top supplier: CTE + scalar subquery (max) — Catalyst plans the scalar "
        "subquery as a broadcast single-row join (BatchExecSingleRowJoinRule "
        "analogue, SURVEY §2.3).",
)
def tpch_q15(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("total_revenue")))
    supp = t(spark, sf_dir, "supplier")
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
            .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="Parts/supplier relationship: adapted — partsupp absent, lineitem serves "
        "as the part↔supplier bridge. NOT IN → null-aware anti join; "
        "COUNT(DISTINCT) over grouped keys.",
)
def tpch_q16(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad_supp = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0) \
        .select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


@register(
    "tpch_q17",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 6) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    doc="Small-quantity-order revenue: correlated scalar subquery (per-part avg) "
        "→ Catalyst decorrelates to an aggregate + join (FlinkDecorrelateProgram "
        "analogue, SURVEY §4.1). Adapted: container predicate absent; threshold "
        "0.5×avg to keep the result non-empty.",
)
def tpch_q17(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    per_part = (li.groupBy(F.col("l_partkey").alias("agg_pk"))
                .agg((F.lit(0.5) * F.avg("l_quantity")).alias("qty_thresh")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.agg_pk)
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,10)")), 6)
              .cast("double") / F.lit(7.0)).alias("avg_yearly")))


@register(
    "tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="Large-volume customer: IN-subquery with HAVING → semi join; "
        "top-100. Plan: orders:lineitem is 1:n, so sum_qty per "
        "surviving order IS the HAVING aggregate — the per-order sum "
        "is computed ONCE and joined to orders, instead of the "
        "literal semi-join + second lineitem scan + re-aggregation "
        "(one fact scan and one fact shuffle total; the decimal "
        "filter is boundary-exact because TPC-H quantities are "
        "integer-valued). The semi-join operator itself is pinned by "
        "the join_* family.",
)
def tpch_q18(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(30,10)"))
                .alias("sq"))
           .where(F.col("sq") > 150))
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice",
                F.round(F.col("sq"), 2).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100))


@register(
    "tpch_q19",
    f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="Discounted revenue: disjunction of conjunctive range predicates across "
        "both join sides (tests join-predicate pushdown through OR). Adapted: "
        "p_container/l_shipmode absent.",
)
def tpch_q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(20, 30)))
    return j.where(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


@register(
    "tpch_q20",
    """
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 's%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 45
      )
    ORDER BY s_suppkey
    """,
    doc="Potential part promotion: adapted — partsupp absent, availqty "
        "threshold becomes shipped-quantity threshold per (supplier, part). "
        "Nested IN subquery over grouped HAVING. Constants re-tuned in "
        "round 11 so the result is non-empty at sf0.01 (the old "
        "LIKE 'p%' matched ZERO parts — names are 'small ring' style — "
        "so the row was vacuously green): LIKE 's%' + HAVING > 45 + "
        "NATION_9 keeps every stage selective AND populated "
        "(136 heavy pairs, 6 result suppliers).",
)
def tpch_q20(spark, sf_dir):
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("s%"))
    heavy = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("sq"))
             .where(F.col("sq") > 45)
             .select("l_suppkey").distinct())
    return (supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_name", "s_suppkey")
            .orderBy("s_suppkey"))


@register(
    "tpch_q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="Suppliers who kept orders waiting: EXISTS + NOT EXISTS (semi + anti "
        "join) on the same fact table. Adapted: 'late' = shipped >60 days after "
        "order date (receipt/commit dates absent). The Spark plan uses the "
        "one-scan grouped rewrite (the q95 precedent, "
        "tpcds_multi_supplier_returned_orders): per order, "
        "COUNT(DISTINCT supplier) >= 2 is the inequality-EXISTS, "
        "COUNT(DISTINCT late supplier) = 1 is the NOT-EXISTS (every late "
        "line belongs to one supplier), and that supplier's late-line "
        "count is the per-order numwait contribution — COUNT(*) in the "
        "EXISTS form counts each qualifying l1 LINE, so a supplier late "
        "on two lines of one order contributes 2. One lineitem scan, one "
        "orderkey join co-partitioned with the per-order agg, no "
        "fact x fact self-join; the oracle keeps the EXISTS form as an "
        "independent statement of the same semantics. The two DISTINCT "
        "counts are computed as TWO-LEVEL plain aggregation (per "
        "(order, supplier) late-line counts, then per order) instead "
        "of multi-countDistinct — Catalyst plans multi-distinct via "
        "Expand, tripling pre-shuffle rows; the two-level form "
        "measured ~2x faster at BOTH sf0.1 and 10x (0.82s/1.17s vs "
        "1.55s/1.81s) because the second aggregation runs over the "
        "already-collapsed (order, supplier) partials. r14 opt: both "
        "levels now share ONE l_orderkey exchange (partitioning by a "
        "subset of the grouping key satisfies the pair-key "
        "distribution), measured 0.85->0.70s sf0.1 / 1.45->1.12s 10x.",
)
def tpch_q21(spark, sf_dir):
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    orders = (t(spark, sf_dir, "orders")
              .where(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")

    # ONE exchange for BOTH aggregation levels: hash-partitioning by
    # l_orderkey alone satisfies the ClusteredDistribution of the
    # (l_orderkey, l_suppkey) grouping AND of the per-order grouping,
    # where the default plan pays two back-to-back shuffles (first on
    # the pair key, then on l_orderkey). The joined rows are projected
    # to 3 narrow columns before the shuffle; the keyless-column
    # repartition stays AQE-coalescible.
    per_supp = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                .select("l_orderkey", "l_suppkey",
                        F.when(late, 1).otherwise(0).alias("is_late"))
                .repartition("l_orderkey")
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum("is_late").alias("supp_late")))
    late_here = F.col("supp_late") > 0
    per = (per_supp.groupBy("l_orderkey")
           .agg(F.count("*").alias("n_supp"),
                F.sum(late_here.cast("int")).alias("n_late_supp"),
                F.max(F.when(late_here, F.col("l_suppkey")))
                .alias("waiting_supp"),
                F.sum("supp_late").alias("n_late_lines"))
           .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)))

    return (per.join(F.broadcast(supp), per.waiting_supp == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .groupBy("s_name")
            .agg(F.sum("n_late_lines").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


@register(
    "tpch_q22",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_nationkey % 5 IN (0, 1, 2)
        AND c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(20,6)))
                         FROM customer
                         WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="Global sales opportunity: scalar subquery threshold + NOT EXISTS anti "
        "join. Adapted: phone prefix → c_nationkey % 5 buckets; q22's "
        "'no orders in 7 years' becomes 'no orders since 2000' — at "
        "sf0.01 EVERY customer has at least one all-time order, so the "
        "unwindowed NOT EXISTS was vacuously empty (round-11 audit); "
        "the dated window keeps the anti join live (31 customers in "
        "3 cntrycode groups).",
)
def tpch_q22(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 5).cast("bigint"))
    eligible = cust.where(F.col("cntrycode").isin(0, 1, 2))
    # decimal avg → deterministic threshold in both engines
    thresh = (eligible.where(F.col("c_acctbal") > 0.0)
              .agg(F.avg(F.col("c_acctbal").cast("decimal(20,6)")).alias("ab")))
    orders = (t(spark, sf_dir, "orders")
              .where(F.col("o_orderdate")
                     >= F.lit("2000-01-01").cast("timestamp"))
              .select("o_custkey"))
    return (
        eligible.join(F.broadcast(thresh))
        .where(F.col("c_acctbal").cast("decimal(20,6)") > F.col("ab"))
        .join(orders, eligible.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum(F.col("c_acctbal").cast("decimal(30,10)")), 2)
             .cast("double").alias("totacctbal"))
        .orderBy("cntrycode"))


@register(
    "tpch_q2",
    """
    WITH part_suppliers AS (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ), regional AS (
      SELECT pk, sk, s_acctbal, s_name, n_name
      FROM part_suppliers
      JOIN supplier ON sk = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part
    JOIN regional ON p_partkey = pk
    WHERE p_size = 15 AND p_type = 'LARGE'
      AND s_acctbal = (SELECT MIN(r2.s_acctbal) FROM regional r2
                       WHERE r2.pk = p_partkey)
    ORDER BY s_acctbal, p_partkey, s_name
    """,
    doc="Minimum-cost supplier (Q2 adapted: partsupp absent → lineitem as "
        "the part↔supplier bridge, supply cost → s_acctbal, min-cost → "
        "min-acctbal). Shape preserved: correlated MIN subquery over a "
        "4-way dimension join, decorrelated by Catalyst to an aggregate "
        "+ join (SURVEY §4.1 decorrelation).",
)
def tpch_q2(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    ps = li.select(F.col("l_partkey").alias("pk"),
                   F.col("l_suppkey").alias("sk")).distinct()
    regional = (ps.join(F.broadcast(supp), ps.sk == supp.s_suppkey)
                .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
                .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                .select("pk", "sk", "s_acctbal", "s_name", "n_name"))
    min_bal = regional.groupBy(F.col("pk").alias("mpk")) \
        .agg(F.min("s_acctbal").alias("min_bal"))
    return (part.join(regional, part.p_partkey == regional.pk)
            .join(min_bal, (F.col("pk") == F.col("mpk"))
                  & (F.col("s_acctbal") == F.col("min_bal")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
            .orderBy("s_acctbal", "p_partkey", "s_name"))


@register(
    "tpch_q11",
    """
    WITH stock AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(CAST(l_quantity * p_retailprice
                                AS DECIMAL(30,10))), 2) AS DOUBLE) AS value
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, value
    FROM stock
    WHERE value > (SELECT SUM(value) * 0.001 FROM stock)
    ORDER BY value DESC, ps_partkey
    """,
    doc="Important stock (Q11 adapted: partsupp absent → shipped quantity × "
        "retail price as inventory value). Shape preserved: grouped "
        "aggregate filtered by a scalar-subquery fraction of the total.",
)
def tpch_q11(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    stock = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
             .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
             .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
             .groupBy("l_partkey")
             .agg(dsum(F.col("l_quantity") * F.col("p_retailprice"))
                  .alias("value")))
    thresh = stock.agg((F.sum("value") * 0.001).alias("th"))
    return (stock.join(F.broadcast(thresh))
            .where(F.col("value") > F.col("th"))
            .select(F.col("l_partkey").alias("ps_partkey"), "value")
            .orderBy(F.desc("value"), "ps_partkey"))
