"""UDF surface + DataSet extras — SURVEY §2.10 / §2.11.

Reference UDF kinds → Spark:
- ScalarFunction.eval (ScalarFunction.java:94)   → pandas_udf (Arrow)
- TableFunction.collect (TableFunction.java:139) → @udtf (Spark 3.5+)
- AggregateFunction acc/merge (AggregateFunction.java:117)
                                                 → pandas_udf GROUPED_AGG
- TableAggregateFunction (TableAggregateFunction.java:115, the Top2
  example from the reference docs)               → applyInPandas
- AsyncTableFunction / lookup join (AsyncLookupJoinRunner.java:53)
                                                 → mapInPandas + batched client
DataSet extras (DataSet.java): mapPartition:229 → mapInPandas;
coGroup:988 → groupBy().cogroup().applyInPandas; side outputs
(SingleOutputStreamOperator.getSideOutput) → tagged filter branches.

Determinism: UDF outputs are value-compared against the oracle, so
every aggregate inside pandas replays the decimal(30,10) quantization
from queries/_util.py with Python Decimals — bit-identical results.
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import functions as F

from . import register
from ._util import t

Q10 = decimal.Decimal("0.0000000001")


@register(
    "udf_pandas_scalar",
    """
    SELECT o_orderkey,
           o_totalprice * 0.9 + 5.0 AS adjusted,
           CASE WHEN o_totalprice >= 30000 THEN 'high'
                WHEN o_totalprice >= 10000 THEN 'mid'
                ELSE 'low' END AS bucket
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="Scalar pandas UDF (Arrow-vectorized): per-value math + "
        "categorization — ScalarFunction.eval equivalent. Row-at-a-time "
        "Python UDFs are banned in this codebase (10-100× slower).",
)
def udf_pandas_scalar(spark, sf_dir):
    @F.pandas_udf("double")
    def adjust(s: pd.Series) -> pd.Series:
        return s * 0.9 + 5.0

    @F.pandas_udf("string")
    def bucket(s: pd.Series) -> pd.Series:
        return pd.cut(s, [-float("inf"), 10000, 30000, float("inf")],
                      right=False, labels=["low", "mid", "high"]) \
            .astype(str)

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return o.select("o_orderkey",
                    adjust("o_totalprice").alias("adjusted"),
                    bucket("o_totalprice").alias("bucket"))


@register(
    "udf_grouped_agg",
    """
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice * l_quantity
                              AS DECIMAL(30,10))), 6) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 6) AS DOUBLE)
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-aggregate pandas UDF (AggregateFunction equivalent): "
        "quantity-weighted mean price. The UDF replays the oracle's "
        "DECIMAL(30,10) accumulation with Python Decimals so the double "
        "result is bit-identical — the same determinism rule as the "
        "built-in aggregates.",
)
def udf_grouped_agg(spark, sf_dir):
    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        q6 = decimal.Decimal("0.000001")
        num = sum((decimal.Decimal(p * q).quantize(
            Q10, rounding=decimal.ROUND_HALF_UP)
            for p, q in zip(price, qty)), decimal.Decimal(0))
        den = sum((decimal.Decimal(q).quantize(
            Q10, rounding=decimal.ROUND_HALF_UP)
            for q in qty), decimal.Decimal(0))
        # round to scale 6 before the double conversion so the scaled
        # integer fits 2^53 — same rule as queries/_util.py
        num = num.quantize(q6, rounding=decimal.ROUND_HALF_UP)
        den = den.quantize(q6, rounding=decimal.ROUND_HALF_UP)
        return float(num) / float(den)

    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(weighted_avg("l_extendedprice", "l_quantity")
                 .alias("weighted_avg_price")))


@register(
    "udf_table_function",
    """
    SELECT doc_id, word, length(word) AS wlen
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 10) u
    WHERE length(word) >= 4
    """,
    doc="Table function (UDTF): one input row → N output rows — "
        "TableFunction.collect / LATERAL TABLE. Python UDTF (Spark 3.5+) "
        "registered and applied via lateral join.",
)
def udf_table_function(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, wlen int")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                if len(w) >= 4:
                    yield w, len(w)

    spark.udtf.register("split_words", SplitWords)
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql("""
        SELECT doc_id, word, wlen
        FROM _udtf_docs, LATERAL split_words(text)
    """)


@register(
    "udf_table_aggregate_top2",
    """
    SELECT c_mktsegment, c_acctbal AS bal, rank FROM (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rank
      FROM customer) r
    WHERE rank <= 2
    """,
    doc="Table aggregate (emits multiple rows per group): the reference "
        "docs' canonical Top2 TableAggregateFunction — applyInPandas "
        "emitting two rows per group (GroupTableAggFunction.java:1).",
)
def udf_table_aggregate_top2(spark, sf_dir):
    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(["c_acctbal", "c_custkey"],
                            ascending=[False, True]).head(2)
        return pd.DataFrame({
            "c_mktsegment": s["c_mktsegment"],
            "bal": s["c_acctbal"],
            "rank": range(1, len(s) + 1),
        })

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        top2, "c_mktsegment string, bal double, rank int")


@register(
    "dataset_map_partition",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_quantity >= 45
    """,
    doc="mapPartition (DataSet.java:229): per-partition batch transform "
        "via mapInPandas — the operator processes whole Arrow batches, the "
        "result is partition-count independent.",
)
def dataset_map_partition(spark, sf_dir):
    def per_partition(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] >= 45][
                ["l_orderkey", "l_linenumber"]].copy()
            src = pdf[pdf["l_quantity"] >= 45]
            out["net"] = src["l_extendedprice"] * (1 - src["l_discount"])
            yield out

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount")
    return li.mapInPandas(
        per_partition, "l_orderkey bigint, l_linenumber int, net double")


@register(
    "dataset_cogroup",
    """
    SELECT o.o_orderkey AS order_key,
           COALESCE(o.o_totalprice, -1.0) AS total_price,
           COALESCE(l.n_lines, 0) AS n_lines
    FROM orders o
    LEFT JOIN (SELECT l_orderkey, COUNT(*) AS n_lines
               FROM lineitem GROUP BY l_orderkey) l
      ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey <= 2000
    """,
    doc="coGroup (DataSet.java:988): both sides grouped by key, processed "
        "together per key — groupBy().cogroup().applyInPandas. The Flink "
        "coGroup sees possibly-empty groups on either side; mirrored here "
        "by emitting orders with zero lineitems.",
)
def dataset_cogroup(spark, sf_dir):
    def merge(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame):
        if orders_pdf.empty:
            return pd.DataFrame(
                columns=["order_key", "total_price", "n_lines"])
        return pd.DataFrame([{
            "order_key": key[0],
            "total_price": float(orders_pdf["o_totalprice"].iloc[0]),
            "n_lines": len(lines_pdf),
        }])

    # project to the columns merge() touches: the two-sided Arrow
    # transfer is the cogroup cost, and it scales with column count
    o = (t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
         .select("o_orderkey", "o_totalprice"))
    li = (t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
          .select("l_orderkey"))
    return (o.groupBy("o_orderkey").cogroup(li.groupBy("l_orderkey"))
            .applyInPandas(merge,
                           "order_key bigint, total_price double, "
                           "n_lines bigint"))


@register(
    "side_outputs",
    """
    SELECT event_id, user_id, 'main' AS tag, value FROM events
    WHERE event_type <> 'error' AND value > 90
    UNION ALL
    SELECT event_id, user_id, 'errors' AS tag, value FROM events
    WHERE event_type = 'error'
    """,
    doc="Side outputs (SingleOutputStreamOperator.getSideOutput / "
        "SplitStream): one parent, multiple tagged branches — two filters "
        "off the same subplan; Catalyst reuses the scan (exchange reuse). "
        "In streaming, each branch is its own sink off one source.",
)
def side_outputs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    main = (e.where((F.col("event_type") != "error") & (F.col("value") > 90))
            .select("event_id", "user_id", F.lit("main").alias("tag"),
                    "value"))
    errors = (e.where(F.col("event_type") == "error")
              .select("event_id", "user_id", F.lit("errors").alias("tag"),
                      "value"))
    return main.unionAll(errors)


@register(
    "async_lookup_join",
    """
    SELECT c_custkey, c_name, n_name AS nation_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 500
    """,
    doc="Async lookup join (FOR SYSTEM_TIME AS OF proctime — "
        "AsyncLookupJoinRunner.java:53, LookupJoinRunner.java:36): per-batch "
        "keyed lookups against an external table, emulated with an "
        "Arrow-batched mapInPandas client (batched RPC shape: one call per "
        "Arrow batch, not per row). For SQL-planned joins the stream-static "
        "join is preferred; this is the per-row-RPC escape hatch.",
)
def async_lookup_join(spark, sf_dir):
    nation_map = {r["n_nationkey"]: r["n_name"]
                  for r in t(spark, sf_dir, "nation").collect()}
    bc = spark.sparkContext.broadcast(nation_map)

    def lookup(batches):
        # stands in for an async client: one batched request per
        # Arrow batch, results joined positionally
        for pdf in batches:
            table = bc.value
            out = pdf[["c_custkey", "c_name"]].copy()
            out["nation_name"] = [table.get(k) for k in pdf["c_nationkey"]]
            yield out

    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500) \
        .select("c_custkey", "c_name", "c_nationkey")
    return c.mapInPandas(
        lookup, "c_custkey bigint, c_name string, nation_name string")
