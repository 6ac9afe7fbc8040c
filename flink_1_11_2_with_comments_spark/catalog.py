"""TableEnvironment-like catalog facade.

Reference equivalents:
- catalog registration: flink-table-common/.../catalog/Catalog.java:51
- DDL with watermark:   flink-sql-parser/.../ddl/SqlCreateTable.java:56,
                        SqlWatermark.java:39

Here a "catalog" is just temp views over the driver-generated parquet
tables, plus a watermark registry: Flink attaches the watermark to the
table definition (DDL), Spark attaches it to the DataFrame at read
time — ``watermarked()`` bridges the two styles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Flink-style table → (rowtime column, bounded out-of-orderness) from
# the WATERMARK FOR ... AS ... - INTERVAL DDL clause.
WATERMARKS: dict[str, tuple[str, str]] = {
    "events": ("ts", "10 minutes"),
}


# columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (nanosAsLong) and we convert to microsecond timestamps here. The data
# has zero sub-microsecond residue (verified), so this is lossless and
# matches DuckDB's read exactly.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (BatchExecTableSourceScan.scala:45 analogue).

    A plain ``spark.read.parquet`` scan: column pruning, predicate
    pushdown and partition pruning all come from the DataSource V2
    path — the reference needed explicit Supports*PushDown contracts
    (flink-table-common/.../abilities/) for the same thing.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in NANO_TS_COLUMNS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            # integer div: nanos exceed 2^53, double division loses 1µs
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TPCH_TABLES) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def watermarked(df: DataFrame, table: str) -> DataFrame:
    """Apply the DDL-declared watermark to a (streaming) DataFrame.

    Flink: WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE (bounded
    out-of-orderness, BoundedOutOfOrdernessWatermarks.java:37).
    Spark: withWatermark — same bounded-delay semantics, evaluated
    as a global minimum across partitions per micro-batch.
    """
    if table in WATERMARKS:
        col, delay = WATERMARKS[table]
        return df.withWatermark(col, delay)
    return df
