"""File formats & filesystem connector — SURVEY §2.1.

Reference: flink-formats/{flink-csv,flink-json,flink-parquet,
flink-orc,flink-avro} + the filesystem connector
(FileSystemTableFactory.java:1, partitioned source/sink).

Spark mapping is direct: format("csv"/"json"/"parquet"/"orc"/"avro")
with partitionBy for the partitioned sink. What deserves code is the
round-trip contract (schema preserved, values exact) and partition
pruning on the partitioned layout — both tested, the latter being
the 100 TB-critical property (a date-partitioned table must show
PartitionFilters in the scan, not a full listing).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_read_roundtrip(df: DataFrame, fmt: str,
                         base_dir: str | None = None,
                         partition_by: list[str] | None = None,
                         **reader_opts) -> DataFrame:
    """Write df in ``fmt`` and read it back with the declared schema.

    CSV/JSON lose types without an explicit schema (the reference's
    formats carry schema in the DDL — SqlCreateTable.java:56); we
    re-apply df.schema on read, which is the same contract.
    """
    spark = df.sparkSession
    path = os.path.join(base_dir or tempfile.mkdtemp(prefix="fmt_"), fmt)
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
        reader_opts.setdefault("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt).schema(df.schema)
    for k, v in reader_opts.items():
        reader = reader.option(k, v)
    return reader.load(path)


def available_formats(spark: SparkSession) -> list[str]:
    """Formats usable in this deployment. Avro ships as an external
    module (spark-avro jar; no Python avro/fastavro fallback exists
    in this container either); gate it behind a probe instead of
    failing at import — the reference similarly splits formats into
    optional modules."""
    fmts = ["parquet", "csv", "json", "orc"]
    try:
        spark.range(0).write.format("avro")._jwrite.toString()
        fmts.append("avro")
    except Exception:
        pass
    return fmts


def sequence_file_roundtrip(df: DataFrame, key_col: str, value_col: str,
                            path: str | None = None) -> DataFrame:
    """Hadoop SequenceFile round-trip — flink-formats' SequenceFile
    writer (SerializedOutputFormat / SequenceFileWriterFactory)
    equivalent. Spark core carries the Hadoop writables natively, so
    unlike Avro this needs no extra jar; the RDD hop is the honest
    cost of a key/value container format with no DataFrame source —
    the same shape the reference's DataSet<Tuple2<K, V>> write has.
    """
    spark = df.sparkSession
    path = path or os.path.join(tempfile.mkdtemp(prefix="seq_"), "data")
    (df.select(key_col, value_col)
     .rdd.map(lambda r: (r[0], r[1]))
     .saveAsSequenceFile(path))
    back = spark.sparkContext.sequenceFile(path)
    return back.toDF([key_col, value_col])
