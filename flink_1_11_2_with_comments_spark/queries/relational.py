"""Per-operator coverage queries: SURVEY §2.2 (calc/correlate/unnest),
§2.3 (all join types & physical strategies), §2.4 (aggregations incl.
grouping sets), §2.6 (sort/limit), §2.7 (set operations).

These mirror the reference's per-operator ITCases
(flink-table-planner-blink/src/test/.../runtime/batch/sql/: CalcITCase,
join/JoinITCase, agg/GroupingSetsITCase, LimitITCase, RankITCase,
SetOperatorsITCase, UnnestITCase) — one small query per operator,
checked against the DuckDB oracle instead of literal expected rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from ._util import dsum, sql_dsum, t

# ---------------------------------------------------------------------------
# §2.2 Calc (fused project + filter), Values, Unnest/Correlate
# ---------------------------------------------------------------------------


@register(
    "calc_project_filter",
    """
    SELECT o_orderkey,
           o_totalprice * 1.1 AS gross,
           CASE WHEN o_orderstatus = 'F' THEN 'final'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_label,
           CAST(o_custkey AS VARCHAR) AS custkey_str,
           COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'LOW!') AS prio
    FROM orders
    WHERE o_totalprice > 1000.0 AND o_orderstatus <> 'P'
    """,
    doc="Calc: fused select+where with CASE/CAST/COALESCE/NULLIF — "
        "StreamExecCalc.scala:39 / CalcCodeGenerator.scala; Catalyst fuses "
        "and codegens identically (one WholeStageCodegen span).",
)
def calc_project_filter(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.where((F.col("o_totalprice") > 1000.0) & (F.col("o_orderstatus") != "P"))
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("gross"),
            F.when(F.col("o_orderstatus") == "F", "final")
            .when(F.col("o_orderstatus") == "O", "open")
            .otherwise("other").alias("status_label"),
            F.col("o_custkey").cast("string").alias("custkey_str"),
            F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
                       F.lit("LOW!")).alias("prio"),
        ))


@register(
    "values_inline",
    """
    SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL))
      AS v(id, tag, score)
    """,
    doc="Values source: inline literal rows — StreamExecValues.scala:39 / "
        "ValuesInputFormat.java:37 → spark.createDataFrame.",
)
def values_inline(spark, sf_dir):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        schema="id int, tag string, score double")


@register(
    "unnest_explode",
    """
    SELECT doc_id, word
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 20) u
    WHERE length(word) > 3
    """,
    doc="UNNEST(array) → Correlate: LogicalUnnestRule.scala:49 → explode. "
        "The lateral join is Catalyst Generate.",
)
def unnest_explode(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return (d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .where(F.length("word") > 3))


@register(
    "unnest_with_ordinality",
    """
    SELECT doc_id, pos - 1 AS pos, word
    FROM (SELECT doc_id,
                 UNNEST(string_split(text, ' ')) AS word,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents WHERE doc_id < 5) u
    """,
    doc="UNNEST WITH ORDINALITY → posexplode (Correlate with ordinal).",
)
def unnest_with_ordinality(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 5)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")) \
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")


# ---------------------------------------------------------------------------
# §2.3 Joins: every join type + physical strategy
# ---------------------------------------------------------------------------


@register(
    "join_inner_shuffle",
    f"""
    SELECT o_orderkey, o_totalprice, {sql_dsum('l_extendedprice')} AS lsum
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    """,
    doc="Inner equi-join fact↔fact: shuffles both sides on the key once; the "
        "downstream agg reuses that partitioning (no second shuffle). "
        "Reference: BatchExecHashJoin.scala:53 / SortMergeJoinOperator.java:62.",
)
def join_inner_shuffle(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_totalprice")
            .agg(dsum("l_extendedprice").alias("lsum")))


@register(
    "join_broadcast",
    """
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    """,
    doc="Broadcast hash join of dimension chain: no shuffle of customer — "
        "BatchExecHashJoin.scala:62-63 isBroadcast → F.broadcast/AQE.",
)
def join_broadcast(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("c_custkey", "c_name", "n_name", "r_name"))


@register(
    "join_sort_merge",
    """
    SELECT l_orderkey, l_linenumber, o_orderdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_quantity > 45
    """,
    doc="Sort-merge join (explicit MERGE hint) — BatchExecSortMergeJoin.scala:52. "
        "On a cluster this is the shuffle-and-spill-safe strategy for two large "
        "sides; hint pins it for plan-shape determinism.",
)
def join_sort_merge(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (li.hint("merge")
            .join(o, li.l_orderkey == o.o_orderkey)
            .select("l_orderkey", "l_linenumber", "o_orderdate"))


@register(
    "join_shuffle_hash",
    """
    SELECT s_suppkey, s_name, cnt
    FROM supplier JOIN (
      SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ) agg ON s_suppkey = l_suppkey
    """,
    doc="Shuffled hash join (SHUFFLE_HASH hint): hash-table build instead of "
        "sort — the Blink default for non-broadcast equi-joins "
        "(HashJoinOperator.java:58, BinaryHashTable.java:60).",
)
def join_shuffle_hash(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    agg = (t(spark, sf_dir, "lineitem").groupBy("l_suppkey")
           .agg(F.count("*").alias("cnt")))
    return (s.hint("shuffle_hash").join(agg, s.s_suppkey == agg.l_suppkey)
            .select("s_suppkey", "s_name", "cnt"))


@register(
    "join_left_outer",
    """
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 40000.0
    """,
    doc="LEFT OUTER with a non-key predicate in the ON clause (kept in the "
        "join, not pushed as filter) — FlinkJoinType.java:24.",
)
def join_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 40000.0),
                   "left")
            .select("c_custkey", "o_orderkey", "o_totalprice"))


@register(
    "join_right_outer",
    """
    SELECT o_orderkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
    doc="RIGHT OUTER join — preserved side is the build side candidate.",
)
def join_right_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey, "right")
            .select("o_orderkey", "c_name"))


@register(
    "join_full_outer",
    """
    SELECT k, a_cnt, b_cnt FROM
      (SELECT l_suppkey AS k, COUNT(*) AS a_cnt FROM lineitem
       WHERE l_quantity > 49 GROUP BY l_suppkey) a
    FULL OUTER JOIN
      (SELECT s_suppkey AS k2, COUNT(*) AS b_cnt FROM supplier
       WHERE s_acctbal > 4000.0 GROUP BY s_suppkey) b
    ON k = k2
    """,
    doc="FULL OUTER join with nulls on both sides — "
        "SortMergeFullOuterJoinIterator.java:1.",
)
def join_full_outer(spark, sf_dir):
    a = (t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
         .groupBy(F.col("l_suppkey").alias("k")).agg(F.count("*").alias("a_cnt")))
    b = (t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4000.0)
         .groupBy(F.col("s_suppkey").alias("k2")).agg(F.count("*").alias("b_cnt")))
    return (a.join(b, a.k == b.k2, "full")
            .select("k", "a_cnt", "b_cnt"))


@register(
    "join_left_semi",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    doc="IN → left-semi join — FlinkJoinType SEMI / "
        "StreamingSemiAntiJoinOperator.java:36.",
)
def join_left_semi(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return (p.join(li, p.p_partkey == li.l_partkey, "left_semi")
            .select("p_partkey", "p_name"))


@register(
    "join_left_anti",
    """
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity > 49)
    """,
    doc="NOT EXISTS → left-anti join — FlinkJoinType ANTI. The "
        "filtered right side keeps BOTH outcomes populated at sf0.01 "
        "(1113 anti rows, 887 matched) — the round-10 fixture's "
        "unfiltered lineitem covered every part, so the result was "
        "vacuously empty and an anti-vs-semi confusion could hide.",
)
def join_left_anti(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    li = (t(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 49))
    return (p.join(li, p.p_partkey == li.l_partkey, "left_anti")
            .select("p_partkey", "p_name"))


@register(
    "join_cross",
    """
    SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
    doc="Cartesian product (tiny sides) — DataSet.cross DataSet.java:1034 / "
        "BatchExecNestedLoopJoin.scala:46.",
)
def join_cross(spark, sf_dir):
    r1 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1_name"))
    r2 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2_name"))
    return (r1.crossJoin(r2).where(F.col("k1") < F.col("k2"))
            .select("r1_name", "r2_name"))


@register(
    "join_theta_nonequi",
    """
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    WHERE s_suppkey <= 10 AND c_custkey <= 200
    """,
    doc="Theta join: equi component + range predicate — nested-loop/banded "
        "join territory (NestedLoopJoinCodeGenerator.scala); Spark plans the "
        "equi part as the join key and evaluates the range as post-condition.",
)
def join_theta_nonequi(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 10)
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return (s.join(c, (s.s_nationkey == c.c_nationkey)
                   & (s.s_acctbal > c.c_acctbal))
            .select("s_suppkey", "c_custkey"))


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_global",
    f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    """,
    doc="Global (ungrouped) aggregate: partial per partition + single final — "
        "two-phase agg is automatic (EnforceLocalAggRuleBase.scala analogue).",
)
def agg_global(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_quantity").alias("sum_qty"))


@register(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS d_supp,
           COUNT(DISTINCT l_partkey) AS d_part,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multiple DISTINCT aggregates in one group: Catalyst rewrites via "
        "Expand (same trick as Blink's SplitAggregateRule.scala:108 + "
        "DecomposeGroupingSetsRule).",
)
def agg_multi_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("d_supp"),
                 F.countDistinct("l_partkey").alias("d_part"),
                 F.count("*").alias("n")))


@register(
    "agg_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="GROUPING SETS + GROUPING() marker — DecomposeGroupingSetsRule.scala:205 "
        "→ Catalyst Expand.",
)
def agg_grouping_sets(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@register(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE = all grouping-set combinations — df.cube().",
)
def agg_cube(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(dsum("l_extendedprice").alias("sum_price")))


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy — df.rollup().",
)
def agg_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n")))


@register(
    "agg_having",
    f"""
    SELECT l_suppkey, {sql_dsum('l_extendedprice')} AS rev
    FROM lineitem GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 15000.0 AND COUNT(*) > 400
    """,
    doc="HAVING → filter above the aggregate.",
)
def agg_having(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_suppkey")
            .agg(dsum("l_extendedprice").alias("rev"),
                 F.sum("l_quantity").alias("_sq"),
                 F.count("*").alias("_n"))
            .where((F.col("_sq") > 15000.0) & (F.col("_n") > 400))
            .select("l_suppkey", "rev"))


@register(
    "agg_minmax_by",
    """
    SELECT l_returnflag,
           ARG_MAX(l_orderkey, l_extendedprice) AS top_order,
           ARG_MIN(l_orderkey, l_extendedprice) AS bottom_order
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="MAX_BY/MIN_BY aggregates — DataSet.maxBy/minBy (DataSet.java:513,548) "
        "→ F.max_by/min_by. Deterministic because l_extendedprice values are "
        "distinct within groups on this data.",
)
def agg_minmax_by(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.expr("max_by(l_orderkey, l_extendedprice)").alias("top_order"),
                 F.expr("min_by(l_orderkey, l_extendedprice)").alias("bottom_order")))


@register(
    "agg_collect_list_set",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(array_agg(n_name)), ',') AS names,
           COUNT(DISTINCT n_name) AS n_distinct
    FROM nation GROUP BY n_regionkey
    """,
    doc="COLLECT / LISTAGG-family: collect_list sorted for determinism — "
        "BuiltInFunctionDefinitions COLLECT; aggfunctions/CollectAggFunction. "
        "Joined to a canonical string so the driver's canonicalizer can hash "
        "the cell (list cells are unhashable in its pandas sort path); the "
        "array-typed variant stays pytest-covered in tests/test_oracle_parity.",
)
def agg_collect_list_set(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return (n.groupBy("n_regionkey")
            .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",")
                 .alias("names"),
                 F.countDistinct("n_name").alias("n_distinct")))


@register(
    "agg_listagg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS name_list
    FROM nation GROUP BY n_regionkey
    """,
    doc="LISTAGG → concat_ws over sorted collect_list "
        "(aggfunctions/ListAggFunction.java).",
)
def agg_listagg(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return (n.groupBy("n_regionkey")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name")))
                 .alias("name_list")))


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(STDDEV_POP(l_quantity), 6) AS sdp_qty,
           ROUND(VAR_POP(l_quantity), 6) AS varp_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="STDDEV/VAR pop+samp — aggfunctions (27 impls). Rounded to 6dp: these "
        "are merge-order-dependent in any engine; quantity values are small "
        "integers so 6dp is stable.",
)
def agg_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
                 F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
                 F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
                 F.round(F.var_pop("l_quantity"), 6).alias("varp_qty")))


@register(
    "agg_pivot",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot: Table API-style column pivot → df.groupBy().pivot().",
)
def agg_pivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(dsum("l_quantity")))


# ---------------------------------------------------------------------------
# §2.6 Sort / limit
# ---------------------------------------------------------------------------


@register(
    "sort_multi_key_nulls",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END
             AS nullable_price
    FROM orders
    ORDER BY o_orderstatus ASC,
             nullable_price DESC NULLS LAST,
             o_orderkey ASC
    LIMIT 50
    """,
    doc="Multi-key global sort with explicit NULLS ordering + limit → "
        "TakeOrderedAndProject (BatchExecSortLimit.scala:52, "
        "BinaryExternalSorter.java:70 analogue). Spark range-partitions "
        "the sort at scale instead of single-node external sort.",
)
def sort_multi_key_nulls(spark, sf_dir):
    o = t(spark, sf_dir, "orders").withColumn(
        "nullable_price",
        F.when(F.col("o_orderstatus") == "P", None).otherwise(F.col("o_totalprice")))
    return (o.select("o_orderkey", "o_totalprice", "o_orderstatus", "nullable_price")
            .orderBy(F.asc("o_orderstatus"),
                     F.desc_nulls_last("nullable_price"),
                     F.asc("o_orderkey"))
            .limit(50))


@register(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
    doc="LIMIT/OFFSET over a total order — BatchExecLimit.scala:47.",
)
def limit_offset(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey").offset(100).limit(20))


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    """
    SELECT c_nationkey AS nk, c_acctbal AS bal FROM customer WHERE c_acctbal > 9000.0
    UNION ALL
    SELECT s_nationkey AS nk, s_acctbal AS bal FROM supplier WHERE s_acctbal > 4500.0
    """,
    doc="UNION ALL — StreamExecUnion.scala:39 (no shuffle, pure concat).",
)
def setop_union_all(spark, sf_dir):
    c = (t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
         .select(F.col("c_nationkey").alias("nk"), F.col("c_acctbal").alias("bal")))
    s = (t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4500.0)
         .select(F.col("s_nationkey").alias("nk"), F.col("s_acctbal").alias("bal")))
    return c.unionAll(s)


@register(
    "setop_union_distinct",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 48
    UNION
    SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 4500.0
    """,
    doc="UNION (distinct) = union-all + distinct agg rewrite.",
)
def setop_union_distinct(spark, sf_dir):
    a = (t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 48)
         .select(F.col("l_suppkey").alias("k")))
    b = (t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4500.0)
         .select(F.col("s_suppkey").alias("k")))
    return a.union(b).distinct()


@register(
    "setop_intersect",
    """
    SELECT l_partkey AS k FROM lineitem WHERE l_quantity >= 49
    INTERSECT
    SELECT p_partkey AS k FROM part WHERE p_size > 25
    """,
    doc="INTERSECT → semi-join rewrite (ReplaceIntersectWithSemiJoinRule.scala:35); "
        "Catalyst has the same rule.",
)
def setop_intersect(spark, sf_dir):
    a = (t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
         .select(F.col("l_partkey").alias("k")))
    b = (t(spark, sf_dir, "part").where(F.col("p_size") > 25)
         .select(F.col("p_partkey").alias("k")))
    return a.intersect(b)


@register(
    "setop_intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
    """,
    doc="INTERSECT ALL → counting-agg rewrite (RewriteIntersectAllRule.scala:1).",
)
def setop_intersect_all(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 49).select(F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") > 0.09).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "setop_except",
    """
    SELECT p_partkey AS k FROM part
    EXCEPT
    SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 47
    """,
    doc="EXCEPT/MINUS → anti-join rewrite (ReplaceMinusWithAntiJoinRule.scala:35).",
)
def setop_except(spark, sf_dir):
    a = t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    b = (t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 47)
         .select(F.col("l_partkey").alias("k")))
    return a.subtract(b)


@register(
    "setop_except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 46
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
    """,
    doc="EXCEPT ALL → counting-agg rewrite (RewriteMinusAllRule.scala:1). "
        "Thresholds chosen so the MULTISET difference is non-empty at "
        "sf0.01 (1845 rows) while the set-EXCEPT of the same branches is "
        "EMPTY (every suppkey appears on both sides) — an implementation "
        "that confused exceptAll with except fails this fixture.",
)
def setop_except_all(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 46).select(F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") > 0.09).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# NULL semantics (reference ITCases use nullData3/4/5 fixtures —
# TestData.scala:110-138 — to pin NULL behavior; VALUES-based here)
# ---------------------------------------------------------------------------

_NULLS = ("(VALUES (1, 10), (2, NULL), (NULL, 30), (NULL, NULL), (5, 50))"
          " t(k, v)")


@register(
    "null_join_semantics",
    f"""
    WITH t AS (SELECT * FROM {_NULLS}),
         u AS (SELECT * FROM (VALUES (1, 'a'), (NULL, 'n'), (5, 'e')) u(k2, tag))
    SELECT t.k, t.v, u.tag
    FROM t JOIN u ON t.k = u.k2
    """,
    doc="NULL join keys never match (SQL equality is null-rejecting) — "
        "pinned against the oracle; rows with NULL k on either side drop.",
)
def null_join_semantics(spark, sf_dir):
    from pyspark.sql import functions as F
    t_ = spark.createDataFrame(
        [(1, 10), (2, None), (None, 30), (None, None), (5, 50)],
        "k int, v int")
    u = spark.createDataFrame([(1, "a"), (None, "n"), (5, "e")],
                              "k2 int, tag string")
    return t_.join(u, t_.k == u.k2).select("k", "v", "tag")


@register(
    "null_not_in",
    f"""
    WITH t AS (SELECT * FROM {_NULLS})
    SELECT k, v FROM t
    WHERE k NOT IN (SELECT k2 FROM (VALUES (2), (NULL)) s(k2))
    """,
    doc="NOT IN with a NULL in the subquery: three-valued logic makes "
        "every row UNKNOWN → empty result. The classic SQL trap; Spark's "
        "null-aware anti join (NOT IN) must reproduce it exactly "
        "(vs left_anti, which would keep rows).",
)
def null_not_in(spark, sf_dir):
    t_ = spark.createDataFrame(
        [(1, 10), (2, None), (None, 30), (None, None), (5, 50)],
        "k int, v int")
    t_.createOrReplaceTempView("_null_t")
    return spark.sql("""
        SELECT k, v FROM _null_t
        WHERE k NOT IN (SELECT k2 FROM VALUES (2), (NULL) s(k2))
    """)


@register(
    "null_aggregates",
    f"""
    WITH t AS (SELECT * FROM {_NULLS})
    SELECT COUNT(*) AS n_rows, COUNT(v) AS n_vals, COUNT(k) AS n_keys,
           CAST(SUM(v) AS BIGINT) AS sum_v, MIN(v) AS min_v,
           COUNT(DISTINCT k) AS d_keys
    FROM t
    """,
    doc="Aggregates ignore NULLs (COUNT(col) vs COUNT(*), SUM skips, "
        "DISTINCT counts non-null) — aggfunctions null paths.",
)
def null_aggregates(spark, sf_dir):
    from pyspark.sql import functions as F
    t_ = spark.createDataFrame(
        [(1, 10), (2, None), (None, 30), (None, None), (5, 50)],
        "k int, v int")
    return t_.agg(
        F.count("*").alias("n_rows"), F.count("v").alias("n_vals"),
        F.count("k").alias("n_keys"),
        F.sum("v").alias("sum_v"), F.min("v").alias("min_v"),
        F.countDistinct("k").alias("d_keys"))


@register(
    "null_distinct_groupby",
    f"""
    WITH t AS (SELECT * FROM {_NULLS})
    SELECT k, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv FROM t GROUP BY k
    """,
    doc="GROUP BY treats NULL as one group (unlike join equality) — "
        "the NULL row groups together; DISTINCT keeps a single NULL.",
)
def null_distinct_groupby(spark, sf_dir):
    from pyspark.sql import functions as F
    t_ = spark.createDataFrame(
        [(1, 10), (2, None), (None, 30), (None, None), (5, 50)],
        "k int, v int")
    return t_.groupBy("k").agg(F.count("*").alias("n"),
                               F.sum("v").alias("sv"))


@register(
    "agg_filter_clause",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                  FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE)
             AS total_f,
           COUNT(DISTINCT o_custkey)
             FILTER (WHERE o_totalprice > 100000) AS custs_big
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Aggregate FILTER clause (Calcite std via FlinkSqlOperatorTable; "
        "AggregateCall.filterArg in the Blink planner): per-aggregate "
        "predicates without CASE rewriting, incl. filtered DISTINCT.",
)
def agg_filter_clause(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_all"),
                 F.count(F.when(F.col("o_totalprice") > 200000, 1))
                 .alias("n_big"),
                 F.round(F.sum(F.when(F.col("o_orderstatus") == "F",
                                      F.col("o_totalprice"))
                               .cast("decimal(30,10)")), 2)
                 .cast("double").alias("total_f"),
                 F.countDistinct(
                     F.when(F.col("o_totalprice") > 100000,
                            F.col("o_custkey"))).alias("custs_big")))


@register(
    "unnest_map",
    """
    WITH kv AS (
      SELECT event_id, 'type' AS k, event_type AS v FROM events
      UNION ALL
      SELECT event_id, 'user', CAST(user_id AS VARCHAR) FROM events
      UNION ALL
      SELECT event_id, 'k', CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                                 AS VARCHAR) FROM events
    )
    SELECT k, COUNT(*) AS n, COUNT(DISTINCT v) AS n_distinct
    FROM kv WHERE event_id < 2000 GROUP BY k
    """,
    doc="UNNEST(map) → per-entry rows: the reference unnests MAP columns "
        "to (key, value) pairs (LogicalUnnestRule.scala handles MapType "
        "via Correlate; MapTypeInfo, flink-core typeutils). Spark: build "
        "MAP<STRING,STRING> with map(), explode to (key, value) — "
        "Generate over the map produces one row per entry, exactly the "
        "array case with a 2-column output. The map here mixes a typed "
        "column, a cast key, and a JSON-extracted field; the oracle "
        "states the same entries as a 3-way UNION (DuckDB maps don't "
        "unnest to rows).",
)
def unnest_map(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("bigint")
        .cast("string"))
    return (e.select("event_id", F.explode(m).alias("k", "v"))
            .groupBy("k")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("v").alias("n_distinct")))


@register(
    "join_salted_skew",
    f"""
    SELECT c.c_mktsegment, COUNT(*) AS n,
           {sql_dsum('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Explicit skew salting as a first-class operator "
        "(operators/skew.salted_join): the probe side scatters each "
        "key over 16 salt sub-keys, the build side replicates 16x, "
        "restoring parallelism under a deliberate hot key. The "
        "oracle is the PLAIN join — salting must be semantics-"
        "preserving row-for-row (also pinned by "
        "test_salted_join_matches_plain_join); the decimal-sum "
        "aggregate proves value-level equivalence, not just counts.",
)
def join_salted_skew(spark, sf_dir):
    from ..operators.skew import salted_join
    o = t(spark, sf_dir, "orders").withColumnRenamed("o_custkey",
                                                     "custkey")
    c = t(spark, sf_dir, "customer").withColumnRenamed("c_custkey",
                                                       "custkey")
    return (salted_join(o, c, "custkey")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"),
                 dsum("o_totalprice").alias("total_price")))


@register(
    "unnest_outer_lateral",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         tok -> length(tok) > 7) AS ts
      FROM documents WHERE doc_id <= 200
    )
    SELECT doc_id, unnest(ts) AS long_tok FROM base WHERE len(ts) > 0
    UNION ALL
    SELECT doc_id, CAST(NULL AS VARCHAR) AS long_tok
    FROM base WHERE len(ts) = 0
    """,
    doc="OUTER UNNEST: LEFT JOIN LATERAL UNNEST(...) ON TRUE — the "
        "row-preserving correlate variant (LogicalUnnestRule.scala:49 "
        "with the left-outer Correlate; unnest_explode covers the "
        "inner form). A document whose filtered token array is EMPTY "
        "still emits one row with a NULL element (44 of the 201 docs here) — Catalyst's "
        "GenerateOuter/explode_outer. The oracle states the same "
        "semantics as inner-unnest UNION ALL the empty-array rows.",
)
def unnest_outer_lateral(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    toks = F.filter(F.split("text", " "),
                    lambda tok: F.length(tok) > 7)
    return d.select("doc_id",
                    F.explode_outer(toks).alias("long_tok"))
