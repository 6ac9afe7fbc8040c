"""Source/sink helpers — SURVEY §2.1.

Almost every reference connector is a format argument in Spark:
parquet/csv/json/orc/avro (flink-formats/*) → spark.read.format(...);
kafka (FlinkKafkaConsumer.java:72) → readStream.format("kafka");
datagen/print/blackhole test connectors → rate/console/noop;
socket sources → readStream.format("socket").

What needs code is the test harness path: replaying a bounded table
as an unbounded stream with multiple micro-batches — the equivalent
of the reference's collection sources + ITCase harness
(StreamExecutionEnvironment.fromCollection, TestData.scala fixtures).
"""

from .replay import replay_as_stream, write_stream_to_memory  # noqa: F401
