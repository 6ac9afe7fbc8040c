"""CDC changelog formats — debezium-json and canal-json, the
flagship table-connector additions of Flink 1.11.

Reference:
- flink-formats/flink-json/src/main/java/org/apache/flink/formats/
  json/debezium/DebeziumJsonDeserializationSchema.java:122 — op
  mapping: c/r -> +I(after); u -> -U(before), +U(after);
  d -> -D(before).
- .../json/canal/CanalJsonDeserializationSchema.java:112 — type
  mapping: INSERT -> +I per data row; UPDATE -> -U(old patched over
  data) + +U(data); DELETE -> -D per data row.

Spark mapping: `from_json` against the envelope schema + `explode`
for Canal's row arrays + a union of filtered projections — all
JVM-side whole-stage codegen, no Python in the parse path. The same
expressions run under readStream (tested), because every step is a
stateless projection. Output rows carry the repo-wide `rowkind`
column (+I/-U/+U/-D — streaming/changelog.py), ordered per source
row by a `change_seq` so the -U/+U pair keeps its emission order
under any downstream re-sort.

Scale: parsing is map-only; a 100 TB Kafka backlog of envelopes
parallelizes by partition with zero shuffle until the consumer
aggregates. Materialization shuffles once by primary key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_debezium_json(df: DataFrame, json_col: str,
                        row_schema: str,
                        keep_cols: tuple = ()) -> DataFrame:
    """Parse Debezium envelopes into changelog rows.

    row_schema: DDL of the payload row, e.g. "id bigint, v string".
    keep_cols: source columns to carry through (e.g. the log offset —
    the changelog ORDER; materialize_upsert needs it to rank a
    delete above the insert it follows).
    Output: (<keep_cols>, change_seq int, rowkind string,
    <payload columns>).
    """
    keep = [F.col(c) for c in keep_cols]
    env = df.withColumn(
        "_e", F.from_json(
            F.col(json_col),
            f"before struct<{row_schema}>, after struct<{row_schema}>, "
            f"op string, ts_ms bigint"))
    ins = (env.where(F.col("_e.op").isin("c", "r"))
           .select(*keep, F.lit(0).alias("change_seq"),
                   F.lit("+I").alias("rowkind"), F.col("_e.after.*")))
    upd_b = (env.where(F.col("_e.op") == "u")
             .select(*keep, F.lit(0).alias("change_seq"),
                     F.lit("-U").alias("rowkind"), F.col("_e.before.*")))
    upd_a = (env.where(F.col("_e.op") == "u")
             .select(*keep, F.lit(1).alias("change_seq"),
                     F.lit("+U").alias("rowkind"), F.col("_e.after.*")))
    dele = (env.where(F.col("_e.op") == "d")
            .select(*keep, F.lit(0).alias("change_seq"),
                    F.lit("-D").alias("rowkind"), F.col("_e.before.*")))
    return ins.unionAll(upd_b).unionAll(upd_a).unionAll(dele)


def parse_canal_json(df: DataFrame, json_col: str,
                     row_schema: str,
                     keep_cols: tuple = ()) -> DataFrame:
    """Parse Canal envelopes into changelog rows.

    Canal batches rows: data is an ARRAY of rows; for UPDATE, old[i]
    holds ONLY the fields of data[i] that changed — the -U row is
    data[i] patched with the fields PRESENT in old[i]
    (CanalJsonDeserializationSchema.java:131 checks field presence).
    Presence is decided by a second parse of `old` as
    array<map<string,string>> — a struct parse alone cannot
    distinguish a field whose old value was explicitly null from a
    field absent from the patch, and an UPDATE of a column FROM null
    must put null in the before-image, not the new value.
    Output: (change_seq int, rowkind string, <payload columns>).
    """
    fields = [p.strip().split()[0] for p in row_schema.split(",")]
    env = df.withColumn(
        "_e", F.from_json(
            F.col(json_col),
            f"data array<struct<{row_schema}>>, "
            f"old array<struct<{row_schema}>>, type string")
    ).withColumn(
        "_op", F.from_json(F.col(json_col),
                           "old array<map<string,string>>"))
    keep = [F.col(c) for c in keep_cols]
    exploded = env.select(
        *keep, "_e.type",
        F.posexplode("_e.data").alias("_i", "_row"),
        F.col("_e.old").alias("_old"),
        F.col("_op.old").alias("_oldmap"))
    ins = (exploded.where(F.col("type") == "INSERT")
           .select(*keep, F.lit(0).alias("change_seq"),
                   F.lit("+I").alias("rowkind"), F.col("_row.*")))
    patched = [
        F.when(F.map_contains_key(F.col("_oldmap")[F.col("_i")], c),
               F.col("_old")[F.col("_i")][c])
        .otherwise(F.col("_row")[c]).alias(c) for c in fields]
    upd_b = (exploded.where(F.col("type") == "UPDATE")
             .select(*keep, F.lit(0).alias("change_seq"),
                     F.lit("-U").alias("rowkind"), *patched))
    upd_a = (exploded.where(F.col("type") == "UPDATE")
             .select(*keep, F.lit(1).alias("change_seq"),
                     F.lit("+U").alias("rowkind"), F.col("_row.*")))
    dele = (exploded.where(F.col("type") == "DELETE")
            .select(*keep, F.lit(0).alias("change_seq"),
                    F.lit("-D").alias("rowkind"), F.col("_row.*")))
    return ins.unionAll(upd_b).unionAll(upd_a).unionAll(dele)


def materialize_upsert(changelog: DataFrame, keys: list[str],
                       order_cols: list[str]) -> DataFrame:
    """Collapse a changelog into its final table state: the LAST
    change per key wins (order = order_cols + change_seq, so an
    update's +U outranks its own -U); keys whose last change is a
    delete (-D) vanish. One shuffle by primary key.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols + ["change_seq"]])
    last = (changelog.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
    return (last.where(~F.col("rowkind").isin("-D", "-U"))
            .drop("rowkind", "change_seq"))
