"""Streaming iterations — DataStream.iterate (DataStream.java:520,
IterativeStream.java): a feedback edge routes part of an operator's
output back into its own input, and elements leave the loop when a
routing condition sends them downstream instead.

Spark mapping: Structured Streaming plans are DAGs — there is no
feedback edge. The emulation routes the feedback through storage:
the loop input is a file-source STREAM over a loop directory; every
micro-batch runs the loop body, splits the result into exit rows
(appended to the output sink) and feedback rows (written BACK into
the loop directory), and the SAME running query picks the feedback
file up as its next micro-batch. One continuously-running streaming
query therefore executes the whole iteration; the driver seeds the
first file and blocks on processAllAvailable(), which returns
exactly when the feedback channel goes silent — the reference's
iteration-termination contract (DataStream.iterate(maxWaitTimeMillis)
ends the loop when no feedback element arrives within the timeout;
quiescence here is the deterministic analogue).

Scale: each micro-batch is a normal distributed batch over the
feedback files (executors do all row work; the driver only observes
query progress), and the loop depth equals the reference's
superstep count, not the data size. The loop directory is a real
shuffle-free channel — at 100 TB swap the local path for an object
store and the mechanism is unchanged. Body transformations are
ordinary streaming DataFrame ops, so Catalyst plans every round.

Flink's canonical iterate example (the minus-one loop from the
DataStream docs) is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def iterate_stream(
    spark: SparkSession,
    seed_df: DataFrame,
    body,
    exit_cond: Column,
    work_dir: str | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """Run ``body`` (a streaming-DataFrame transform) over ``seed_df``
    with a feedback loop: rows satisfying ``exit_cond`` AFTER the body
    leave the loop; the rest feed back. Returns the batch DataFrame of
    every exited row once the loop has quiesced.

    ``max_rounds`` bounds the feedback depth (IterativeStream has the
    same guard via its wait timeout): a body that never drives rows
    toward the exit raises rather than looping forever. The exit
    condition must be expressible on the body's OUTPUT schema, which
    must equal the loop input schema (the reference requires the
    feedback type to match the iteration input type —
    IterativeStream.closeWith's type check).
    """
    root = work_dir or tempfile.mkdtemp(prefix="spark_iterate_")
    loop_dir = os.path.join(root, "loop")
    out_dir = os.path.join(root, "out")
    chk = os.path.join(root, "chk")
    os.makedirs(loop_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)
    schema = seed_df.schema
    seed_df.write.mode("append").parquet(loop_dir)

    rounds = {"n": 0}

    def route(df: DataFrame, epoch_id: int) -> None:
        rounds["n"] = epoch_id + 1
        if epoch_id >= max_rounds:
            raise RuntimeError(
                f"iterate_stream: feedback still active after "
                f"{max_rounds} rounds — body does not converge")
        df.persist()
        try:
            # Route EVERY row exactly once (IterativeStream routes all
            # elements): a NULL exit condition must not vanish from
            # both branches, so the split is on coalesce(cond, false)
            # and its negation — NULL rows keep circulating until the
            # body resolves them (or max_rounds trips).
            decided = F.coalesce(exit_cond, F.lit(False))
            df.where(decided).write.mode("append").parquet(out_dir)
            fb = df.where(~decided)
            if fb.limit(1).count() > 0:
                fb.write.mode("append").parquet(loop_dir)
        finally:
            df.unpersist()

    src = spark.readStream.schema(schema).parquet(loop_dir)
    q = (body(src).writeStream.foreachBatch(route)
         .option("checkpointLocation", chk).start())
    try:
        # blocks until every file — INCLUDING feedback files written
        # by earlier micro-batches — has been processed: the loop
        # runs to quiescence inside this one call
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.schema(schema).parquet(out_dir)
    return out
