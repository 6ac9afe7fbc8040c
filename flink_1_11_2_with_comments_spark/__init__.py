"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference (Apache Flink 1.11.2, Blink planner).

Everything here is a Spark-first re-expression of the reference's
capability surface (see SURVEY.md): the DataFrame/SQL API + Catalyst
replace the Blink planner, Structured Streaming replaces the
per-record streaming runtime, and custom stateful operators fill the
genuine gaps (as-of joins, count windows, CEP, streaming TopN).

Package layout:
    session     SparkSession factory tuned for the harness
    catalog     TableEnvironment facade + StatementSet + watermark DDL
    table       fluent Table API facade (+ Tumble/Slide/Session)
    datastream  fluent DataStream facade (map/key_by/window/process)
    queries/    registry of (spark query, DuckDB oracle SQL) pairs
    operators/  batch operator layer (graph iteration, skew salting)
    functions/  Flink scalar-function gap fillers
    streaming/  watermarks, windows, stateful custom operators
    pipeline/   training-data ops (dedup, ANN/IVF, text, multimodal)
    sources/    source/sink helpers + deterministic stream replay
    plans/      Flink-SQL dialect translation + MATCH_RECOGNIZE parser

Entry points:
    from flink_1_11_2_with_comments_spark import TableEnvironment
    env = TableEnvironment(spark, sf_dir)
    env.sql_query("...")            # Flink-dialect SQL front door
    env.scan("orders")              # fluent Table
    DataStream(df).key_by(...)      # fluent DataStream
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy exports — keep `import flink_1_11_2_with_comments_spark`
    # free of a SparkSession/py4j requirement at import time
    if name == "TableEnvironment":
        from .catalog import TableEnvironment
        return TableEnvironment
    if name == "Table":
        from .table import Table
        return Table
    if name == "DataStream":
        from .datastream import DataStream
        return DataStream
    raise AttributeError(name)
