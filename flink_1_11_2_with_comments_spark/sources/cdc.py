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

    def ch(seq, kind, image):
        return F.struct(F.lit(seq).alias("change_seq"),
                        F.lit(kind).alias("rowkind"),
                        F.col(f"_e.{image}").alias("row"))

    # ONE parse, ONE pass: each envelope maps to its array of change
    # rows and a single explode emits them — the previous
    # union-of-filtered-projections re-evaluated from_json once per
    # branch (4 parses/row), the dominant cost at 10x scale
    # (SCALE_r09: debezium 2.47, canal 3.67)
    changes = (F.when(F.col("_e.op").isin("c", "r"),
                      F.array(ch(0, "+I", "after")))
               .when(F.col("_e.op") == "u",
                     F.array(ch(0, "-U", "before"), ch(1, "+U", "after")))
               .when(F.col("_e.op") == "d",
                     F.array(ch(0, "-D", "before"))))
    return (env.select(*keep, F.explode(changes).alias("_c"))
            .select(*keep, F.col("_c.change_seq").alias("change_seq"),
                    F.col("_c.rowkind").alias("rowkind"),
                    F.col("_c.row.*")))


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
    patched = F.struct(*[
        F.when(F.map_contains_key(F.col("_oldmap")[F.col("_i")], c),
               F.col("_old")[F.col("_i")][c])
        .otherwise(F.col("_row")[c]).alias(c) for c in fields])

    def ch(seq, kind, image):
        return F.struct(F.lit(seq).alias("change_seq"),
                        F.lit(kind).alias("rowkind"),
                        image.alias("row"))

    # same ONE-parse/ONE-pass shape as parse_debezium_json: the
    # double from_json and the data explode run once; each (envelope,
    # data row) maps to its change array and a second explode emits
    # the -U/+U pair in order
    changes = (F.when(F.col("type") == "INSERT",
                      F.array(ch(0, "+I", F.col("_row"))))
               .when(F.col("type") == "UPDATE",
                     F.array(ch(0, "-U", patched),
                             ch(1, "+U", F.col("_row"))))
               .when(F.col("type") == "DELETE",
                     F.array(ch(0, "-D", F.col("_row")))))
    return (exploded.select(*keep, F.explode(changes).alias("_c"))
            .select(*keep, F.col("_c.change_seq").alias("change_seq"),
                    F.col("_c.rowkind").alias("rowkind"),
                    F.col("_c.row.*")))


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
