"""External connectors — SURVEY §2.1 (kafka, jdbc, test connectors).

The reference ships each connector as a separate module
(flink-connectors/flink-connector-kafka FlinkKafkaConsumer.java:72,
flink-connector-jdbc, ...); Spark equivalents are format strings, but
kafka needs the spark-sql-kafka jar and JDBC needs a driver jar —
neither is in this container, so the constructors probe and raise a
clear error instead of failing deep inside the JVM.

Test connectors (DataGenTableSourceFactory / PrintTableSinkFactory /
BlackHoleTableSinkFactory) map to rate / console / noop and are
always available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source(spark: SparkSession, bootstrap: str, topic: str,
                 starting_offsets: str = "earliest") -> DataFrame:
    """readStream.format("kafka") — FlinkKafkaConsumer equivalent
    (offsets via startingOffsets; exactly-once via checkpointed
    offsets, replacing the reference's offset-in-checkpoint design)."""
    try:
        return (spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap)
                .option("subscribe", topic)
                .option("startingOffsets", starting_offsets)
                .load())
    except Exception as e:  # jar probe
        raise RuntimeError(
            "kafka connector requires the spark-sql-kafka package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>); "
            "not bundled in this environment") from e


def jdbc_source(spark: SparkSession, url: str, table: str,
                partition_column: str | None = None,
                num_partitions: int = 8, **opts) -> DataFrame:
    """format("jdbc") — flink-connector-jdbc equivalent. At scale ALWAYS
    pass partition_column + bounds: an unpartitioned JDBC read is a
    single-task scan."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", num_partitions))
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(
            "jdbc read failed — a JDBC driver jar must be on the "
            "classpath (spark.jars)") from e


def datagen_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """DataGen test connector → rate source (monotonic id + proctime)."""
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())


def print_sink(df: DataFrame, **options):
    """Print sink → console (for debugging only)."""
    return df.writeStream.format("console").options(**options)


def blackhole_sink(df: DataFrame):
    """BlackHole sink → noop (throughput measurement)."""
    return df.writeStream.format("noop")
