"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference (Apache Flink 1.11.2, Blink planner).

Everything here is a Spark-first re-expression of the reference's
capability surface (see SURVEY.md): the DataFrame/SQL API + Catalyst
replace the Blink planner, Structured Streaming replaces the
per-record streaming runtime, and custom stateful operators fill the
genuine gaps (as-of joins, count windows, CEP, streaming TopN).

Package layout:
    session     SparkSession factory tuned for the harness
    catalog     TableEnvironment-like facade (views over testdata)
    queries/    registry of (spark query, DuckDB oracle SQL) pairs
    operators/  batch operator layer (joins, aggs, rank, setops...)
    functions/  Flink scalar-function gap fillers
    streaming/  watermarks, windows, stateful custom operators
    pipeline/   training-data ops (dedup, ANN, text, multimodal)
    sources/    source/sink helpers
    plans/      explain/plan-assertion helpers
"""

__version__ = "0.1.0"
