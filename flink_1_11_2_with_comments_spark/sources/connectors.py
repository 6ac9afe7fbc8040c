"""External connectors — SURVEY §2.1 (kafka, jdbc, test connectors).

The reference ships each connector as a separate module
(flink-connectors/flink-connector-kafka FlinkKafkaConsumer.java:72,
flink-connector-jdbc, ...); Spark equivalents are format strings.

Kafka needs the spark-sql-kafka jar; the constructor probes and
raises a clear error. An embedded real path (the Derby precedent) was
investigated and is impossible in this container: no spark-sql-kafka
or kafka-clients jar in the Spark distribution, no kafka Python
client, no broker binary — and unlike Derby (which Spark bundles for
its Hive metastore) Kafka has no in-process embedded mode shipped
with Spark at all. The gate itself is tested
(tests/test_sources.py::test_kafka_gated_error).

JDBC is EXERCISED FOR REAL against embedded Apache Derby — Spark
bundles the Derby jars for its Hive metastore, so
jdbc_sink/jdbc_source round-trip through a genuinely external SQL
engine (the flink-connector-jdbc JdbcDynamicTableSource/Sink
analogue), query: jdbc_lookup_join. The Hive catalog is likewise
exercised for real (sources/hive.py: enableHiveSupport + embedded
Derby metastore).

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


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(name: str) -> str:
    """In-memory embedded Derby URL — the in-container stand-in for a
    real database server (Derby ships with Spark for the Hive
    metastore, so no extra jar is needed)."""
    return f"jdbc:derby:memory:{name};create=true"


def jdbc_sink(df: DataFrame, url: str, table: str,
              driver: str | None = None, mode: str = "overwrite",
              **opts) -> None:
    """df.write.format('jdbc') — JdbcDynamicTableSink equivalent
    (flink-connector-jdbc JdbcOutputFormat batched upsert path). At
    scale, size batchsize and numPartitions to the target DB's write
    throughput — every partition opens its own connection."""
    writer = (df.write.format("jdbc")
              .option("url", url).option("dbtable", table))
    if driver is not None:
        writer = writer.option("driver", driver)
    for k, v in opts.items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
    except Exception as e:
        raise RuntimeError(
            "jdbc write failed — a JDBC driver jar must be on the "
            "classpath (embedded Derby is bundled: DERBY_DRIVER)") from e


def _gated_format(kind: str, package_hint: str):
    """Factory for connectors whose DataSource jar is not bundled here:
    the constructor probes and raises the actionable error instead of
    an opaque ClassNotFoundException — the same contract as
    kafka_source. The reference ships each of these as an optional
    connector module too (flink-connectors/flink-connector-{hbase,
    elasticsearch7,cassandra}); absence of the jar, not of the
    integration, is the gated condition."""

    def read(spark: SparkSession, fmt_options: dict) -> DataFrame:
        try:
            reader = spark.read.format(kind)
            for k, v in fmt_options.items():
                reader = reader.option(k, v)
            return reader.load()
        except Exception as e:
            raise RuntimeError(
                f"{kind} connector requires {package_hint} on the "
                "classpath; not bundled in this environment") from e

    return read


# flink-connectors/flink-connector-elasticsearch7 equivalent
elasticsearch_source = _gated_format(
    "org.elasticsearch.spark.sql",
    "the elasticsearch-spark connector jar "
    "(--packages org.elasticsearch:elasticsearch-spark-30_2.13:<ver>)")

# flink-connectors/flink-connector-hbase equivalent
hbase_source = _gated_format(
    "org.apache.hadoop.hbase.spark",
    "the hbase-spark connector jar (hbase-connectors project)")

# flink-connectors/flink-connector-cassandra equivalent
cassandra_source = _gated_format(
    "org.apache.spark.sql.cassandra",
    "the spark-cassandra-connector jar (--packages com.datastax."
    "spark:spark-cassandra-connector_2.13:<ver>)")


def kinesis_source(spark: SparkSession, stream_name: str,
                   region: str) -> DataFrame:
    """flink-connectors/flink-connector-kinesis equivalent. OSS Spark
    has NO Structured Streaming Kinesis source (the ASL package is
    DStream-only); a third-party DSv2 connector jar is required. The
    constructor states that instead of failing opaquely."""
    raise RuntimeError(
        "kinesis DSv2 connector requires a third-party Structured "
        "Streaming Kinesis jar (OSS spark-streaming-kinesis-asl is "
        "DStream-only); not bundled in this environment. For the "
        "wire-protocol path use sources.kinesis_rest (SigV4-signed "
        "JSON client, batch shard drain)")


def rabbitmq_source(spark: SparkSession, queue: str,
                    host: str) -> DataFrame:
    """flink-connectors/flink-connector-rabbitmq equivalent. Spark has
    no RabbitMQ connector (first- or second-party); the deployment
    pattern is an AMQP→Kafka/file bridge feeding a supported source.
    The constructor states that instead of failing opaquely."""
    raise RuntimeError(
        "rabbitmq connector requires bridging AMQP into a supported "
        "source (Kafka or files) — no Spark RabbitMQ connector exists. "
        "Use sources.amqp_wire (real AMQP 0-9-1 client + "
        "amqp_bridge_to_kafka_log) for that bridge")


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
