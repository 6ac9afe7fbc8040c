"""Queryable state — SURVEY §2.9 (previously marked out of scope).

Reference: KeyedStream.asQueryableState (KeyedStream.java:934) — an
external client point-looks-up operator state by key while the job
runs. Spark 4's state data source is the same capability over the
checkpoint: `spark.read.format("statestore")` reads any stateful
operator's keyed state (live or completed query), one row per key
with the key/value structs of the operator.

Differences, documented: reads go through the checkpoint files (not
an RPC into executor memory), so visibility lags by one committed
micro-batch — the same read-committed semantics Flink's queryable
state has across checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_keyed_state(spark: SparkSession, checkpoint_dir: str,
                     operator_id: int = 0, batch_id: int | None = None,
                     store_name: str = "default") -> DataFrame:
    """Read a stateful operator's keyed state from its checkpoint:
    one row per key, columns flattened to key_*/value_* scalars."""
    r = (spark.read.format("statestore")
         .option("operatorId", operator_id)
         .option("storeName", store_name))
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    df = r.load(checkpoint_dir)
    key_cols = [f"key.{f.name}" for f in df.schema["key"].dataType.fields]
    val_cols = [f"value.{f.name}"
                for f in df.schema["value"].dataType.fields]
    return df.selectExpr(*key_cols, *val_cols)
