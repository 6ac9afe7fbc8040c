"""Distributed PCA over the embedding corpus — covariance + power
iteration, expressed entirely in DataFrame ops.

The training-data use case: whitening / decorrelating an embedding
column before ANN indexing or dedup thresholding (PQ and IVF both
assume roughly isotropic residuals), and projecting onto the top
principal component for fast 1-D pre-filters. The reference's
equivalent surface is iterative DataSet algebra (DataSet.iterate,
flink-java/.../DataSet.java:1139 — the same superstep contract the
Gelly ops here already mirror via operators/graph._superstep).

Scale design (100 TB embeddings, dimension D):
- The DATA-heavy step is the Gram/covariance pass: one self-join of
  the exploded (vec_id, i, x) rows keyed by vec_id — each vector
  contributes D^2 pair rows, aggregated per (i, j) with map-side
  partials. The output is D^2 rows (4096 for D=64) — tiny — and is
  materialized ONCE (localCheckpoint) before iteration.
- Power iteration then touches ONLY the D^2-row matrix and a D-row
  vector per round: matrix-vector product as a join+groupBy, L2
  normalization as a 1-row aggregate broadcast back. Corpus data is
  never touched again; no driver-side eigensolver, no .collect().
- Every float reduction uses the DECIMAL-accumulate → round → double
  discipline (queries/_util.py), so covariance, iterates, and
  projections are bit-identical across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(30,14)"


def _dsum12(col):
    return F.round(F.sum(col.cast(DEC)), 12).cast("double")


def explode_embedding(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, i, x) with 1-based positions
    (matching SQL generate_subscripts) and double-typed values."""
    return (emb.select("vec_id",
                       F.posexplode("embedding").alias("p", "xf"))
            .select("vec_id", (F.col("p") + 1).alias("i"),
                    F.col("xf").cast("double").alias("x")))


def covariance(z: DataFrame, upper_only: bool = False) -> DataFrame:
    """Population covariance matrix of the exploded embedding rows:
    (i, j, cov), full D x D (or upper triangle for reporting).

    One self-join keyed by vec_id; every per-(i, j) statistic —
    sum(x*y), sum(x), sum(y), n — comes from the SAME single
    aggregation, so the whole matrix costs one pair-shuffle and no
    mean-side join. cov = E[xy] - E[x]E[y], each expectation exact
    via decimal accumulation, final value rounded to 12 dp.
    """
    a = z
    b = z.select(F.col("vec_id").alias("vid2"), F.col("i").alias("j"),
                 F.col("x").alias("y"))
    pairs = a.join(b, a.vec_id == b.vid2)
    s = (pairs.groupBy("i", "j")
         .agg(F.round(F.sum((F.col("x") * F.col("y")).cast(DEC)), 9)
              .cast("double").alias("sxy"),
              F.round(F.sum(F.col("x").cast(DEC)), 9)
              .cast("double").alias("sx"),
              F.round(F.sum(F.col("y").cast(DEC)), 9)
              .cast("double").alias("sy"),
              F.count("*").alias("n")))
    cov = s.select(
        "i", "j",
        F.round(F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                12).alias("cov"))
    return cov.where(F.col("i") <= F.col("j")) if upper_only else cov


def power_top1(cov_full: DataFrame, rounds: int = 8) -> DataFrame:
    """Top principal component of the full covariance matrix by power
    iteration: v <- normalize(C v), `rounds` times from the uniform
    unit start 1/sqrt(D). Returns (i, v).

    Per round: one D^2 x D join + D-row aggregate (the mat-vec), one
    1-row L2 norm broadcast back. The matrix is materialized once and
    each iterate's lineage is truncated (the DataSet.iterate
    superstep contract — see operators/graph._superstep), so round R
    never replays rounds 1..R-1. Each iterate rounds to 12 dp: the
    iteration is exactly reproducible on any cluster and in any SQL
    engine that unrolls the same rounds.
    """
    from ..operators.graph import _superstep

    covf = _superstep(cov_full)
    dims = covf.select("i").distinct()
    d1 = dims.agg(F.count("*").alias("d"))
    v = (dims.crossJoin(F.broadcast(d1))
         .select("i", (F.lit(1.0) / F.sqrt(F.col("d"))).alias("v")))
    for _ in range(rounds):
        vr = v.select(F.col("i").alias("j2"), F.col("v").alias("vj"))
        w = (covf.join(vr, covf.j == vr.j2)
             .groupBy("i")
             .agg(_dsum12(F.col("cov") * F.col("vj")).alias("w")))
        nrm = w.agg(
            F.round(F.sqrt(_dsum12(F.col("w") * F.col("w"))), 12)
            .alias("nrm"))
        v = _superstep(
            w.crossJoin(F.broadcast(nrm))
            .select("i", F.round(F.col("w") / F.col("nrm"), 12)
                    .alias("v")))
    return v


def project_top1(z: DataFrame, v: DataFrame, scale: int = 6) -> DataFrame:
    """Project every vector onto the component: (vec_id, pc1). The
    D-row component broadcasts; the corpus aggregates map-side."""
    vb = v.select(F.col("i").alias("vi"), F.col("v").alias("vv"))
    return (z.join(F.broadcast(vb), z.i == vb.vi)
            .groupBy("vec_id")
            .agg(F.round(F.sum((F.col("x") * F.col("vv")).cast(DEC)),
                         scale).cast("double").alias("pc1")))
