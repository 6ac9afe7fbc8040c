"""Skew handling for large joins — SCALE.md §Joins.

Two mechanisms, both standard Spark practice:

- AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
  our session defaults): oversized shuffle partitions are split at
  runtime. Zero code, covers organic skew.
- Explicit key salting (this module) for DELIBERATE hot keys known in
  advance (a null-heavy outer join, a single whale customer): the
  probe side scatters each hot key across `salt` sub-keys, the build
  side replicates its matching rows `salt`×, restoring parallelism at
  the cost of build-side duplication. This is what the reference's
  two-phase distinct-agg split does for aggregates
  (SplitAggregateRule.scala:108) — the join-side analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join on `key` with the left (large/skewed) side salted.

    left gets a uniform random salt in [0, salt); right is replicated
    salt× with every salt value; the join key becomes (key, salt), so
    one hot key spreads over `salt` shuffle partitions. Result is
    row-identical to left.join(right, key, how) — the salt columns
    are internal and dropped.

    Inner and left joins only (the replicate side must be the
    preserved-row side's build): semantics of right/full would
    duplicate unmatched right rows.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"))
    exploded_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_left.join(exploded_right, [key, "__salt"], how)
    return out.drop("__salt")
