"""Similarity search over embedding columns (array<float>).

Scale design:
- Brute-force cosine top-k: the baseline — per-row dot products
  stay JVM-side (position-explode + decimal-sum for oracle-exact
  determinism, or zip_with/aggregate for peak throughput); a query
  against N vectors is one scan, no shuffle except the final top-k.
- LSH hyperplane bucketing: the scale path — deterministic
  md5-derived hyperplanes, 16-bit bucket key; candidates collide in
  buckets, turning all-pairs search into a bucket-local join.
  A production IVF variant replaces the hyperplanes with k-means
  centroids; the plumbing (bucket → local search) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int_expr

DEC = "decimal(38,10)"


def _dots(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """dot, |a|², |b|² via position explode + exact decimal sums.

    Decimal accumulation keeps the result order-independent and
    bit-identical across engines (see queries/_util.py) — floats are
    cast to double exactly, products are IEEE-deterministic.
    """
    z = pairs.select(
        "*",
        F.posexplode(F.arrays_zip(F.col(a_col).alias("x"),
                                  F.col(b_col).alias("y")))
        .alias("pos", "p"))
    px = F.col("p.x").cast("double")
    py = F.col("p.y").cast("double")
    keys = [c for c in pairs.columns if c not in (a_col, b_col)]
    return (z.groupBy(*keys)
            .agg(F.sum((px * py).cast(DEC)).alias("dot_d"),
                 F.sum((px * px).cast(DEC)).alias("na_d"),
                 F.sum((py * py).cast(DEC)).alias("nb_d"))
            .withColumn("cosine",
                        F.round(F.col("dot_d").cast("double")
                                / (F.sqrt(F.col("na_d").cast("double"))
                                   * F.sqrt(F.col("nb_d").cast("double"))), 9))
            .drop("dot_d", "na_d", "nb_d"))


def cosine_topk(embeddings: DataFrame, id_col: str, vec_col: str,
                query_id: int, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against one stored vector."""
    q = (embeddings.where(F.col(id_col) == query_id)
         .select(F.col(vec_col).alias("qvec")))
    cand = (embeddings.where(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(q)))
    scored = _dots(cand.select(id_col, vec_col, "qvec"), vec_col, "qvec")
    return (scored.orderBy(F.desc("cosine"), id_col).limit(k)
            .select(id_col, "cosine"))


def cosine_pairs(embeddings: DataFrame, id_col: str, vec_col: str,
                 threshold: float = 0.95,
                 max_id: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine ≥ threshold).

    All-pairs form for small/bucketed inputs; at scale feed this the
    bucket-local pairs from lsh_buckets instead of a full cross join.
    """
    e = embeddings if max_id is None else embeddings.where(
        F.col(id_col) <= max_id)
    a = e.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = e.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    scored = _dots(pairs, "va", "vb")
    return scored.where(F.col("cosine") >= threshold) \
        .select("a_id", "b_id", "cosine")


def lsh_buckets(embeddings: DataFrame, id_col: str, vec_col: str,
                n_planes: int = 16) -> DataFrame:
    """Hyperplane-LSH bucket key per vector.

    Plane j, dim i has weight (md5_int(j|i) % 2001 - 1000)/1000 —
    deterministic pseudo-random in [-1, 1], replayable in SQL. Bucket
    bit j = sign(vec · plane_j); key = 16-bit int.
    """
    z = embeddings.select(
        id_col, F.posexplode(vec_col).alias("i", "x"))
    planes = z.select(
        id_col, "i", "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("j"))
    w = ((md5_int_expr(F.concat_ws("|", F.col("j"), F.col("i")))
          % 2001) - 1000) / 1000.0
    contrib = planes.withColumn(
        "c", (F.col("x").cast("double") * w).cast(DEC))
    return (contrib.groupBy(id_col, "j")
            .agg(F.sum("c").alias("s"))
            .withColumn("bit", F.when(F.col("s") > 0,
                                      F.expr("CAST(1 AS BIGINT) << j"))
                        .otherwise(F.lit(0).cast("bigint")))
            .groupBy(id_col)
            .agg(F.sum("bit").cast("bigint").alias("bucket")))
