"""Similarity search over embedding columns (array<float>).

Scale design:
- Brute-force cosine top-k: the baseline — per-row dot products are
  pure JVM expressions (`zip_with` product + `aggregate` decimal sum:
  no explode, NO shuffle until the final top-k). Decimal accumulation
  keeps results order-independent and bit-identical to the DuckDB
  oracle (decimal addition is exact, hence associative).
- LSH hyperplane bucketing: the scale path — deterministic
  md5-derived hyperplanes, 16-bit bucket key computed per row with
  zero shuffles; candidates collide in buckets, turning all-pairs
  search into a bucket-local join. The IVF variant (ivf_assign /
  ivf_topk) replaces hyperplanes with sampled centroids; the plumbing
  (bucket → local search) is identical.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int_expr

DEC = "decimal(18,10)"


def _dec_sum(arr: Column) -> Column:
    """Exact sequential decimal sum of an array<decimal> — associative,
    so equal to any engine's SUM over the same values.

    Precision 18 (not 38) on purpose, for two reasons: (1) Spark types
    decimal(p,s) + decimal(p,s) as decimal(p+1,s) capped at 38 — at
    p=38 the cap forces scale loss (each partial sum rounds to scale
    9), while at p=18 the sum keeps scale 10 exactly, matching any
    engine's exact decimal SUM of the same values; (2) precision ≤ 18
    stays in Spark's Long-backed compact Decimal representation —
    ~10× faster than the BigDecimal path. 8 integer digits bounds
    |dot| < 1e8: plenty for unit-magnitude embedding coordinates.
    """
    return F.aggregate(arr, F.lit(0).cast(DEC),
                       lambda acc, v: (acc + v).cast(DEC))


def dot_product(a: Column, b: Column) -> Column:
    """vec·vec as exact decimal: products in double (IEEE-exact), each
    cast to decimal(38,10), summed exactly. Whole-row JVM expression —
    no explode, no shuffle."""
    prods = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    return _dec_sum(prods)


def _dots(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """cosine(a, b) per row. Pure projection (scan-side, codegen'd);
    the previous position-explode + groupBy formulation shuffled
    dims× the input — this one shuffles nothing."""
    keys = [c for c in pairs.columns if c not in (a_col, b_col)]
    a, b = F.col(a_col), F.col(b_col)
    return pairs.select(
        *keys,
        F.round(dot_product(a, b).cast("double")
                / (F.sqrt(dot_product(a, a).cast("double"))
                   * F.sqrt(dot_product(b, b).cast("double"))),
                9).alias("cosine"))


def _with_norm(df: DataFrame, id_col: str, vec_col: str,
               prefix: str) -> DataFrame:
    """(id, vec, |vec|) with the norm computed ONCE per vector — linear
    work hoisted out of the O(n²) pairing (where Catalyst would
    otherwise re-evaluate it per candidate pair, inside the join
    condition AND the output projection)."""
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"v{prefix}"),
        F.sqrt(dot_product(F.col(vec_col), F.col(vec_col)).cast("double"))
        .alias(f"n{prefix}"))


def cosine_topk(embeddings: DataFrame, id_col: str, vec_col: str,
                query_id: int, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against one stored vector: one scan +
    TakeOrderedAndProject (per-partition heap, driver merges k·P)."""
    q = _with_norm(embeddings.where(F.col(id_col) == query_id),
                   id_col, vec_col, "b").select("vb", "nb")
    cand = (_with_norm(embeddings.where(F.col(id_col) != query_id),
                       id_col, vec_col, "a")
            .crossJoin(F.broadcast(q)))
    scored = cand.select(
        F.col("a_id").alias(id_col),
        F.round(dot_product(F.col("va"), F.col("vb")).cast("double")
                / (F.col("na") * F.col("nb")), 9).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def cosine_pairs(embeddings: DataFrame, id_col: str, vec_col: str,
                 threshold: float = 0.95,
                 max_id: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine ≥ threshold).

    All-pairs form for small/bucketed inputs; at scale feed this the
    bucket-local pairs from lsh_buckets instead of a full cross join.
    Per-pair work is exactly one dot product (norms precomputed per
    side), so the n² stage does the minimum possible arithmetic.
    """
    e = embeddings if max_id is None else embeddings.where(
        F.col(id_col) <= max_id)
    a = _with_norm(e, id_col, vec_col, "a")
    b = _with_norm(e, id_col, vec_col, "b")
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    scored = pairs.select(
        "a_id", "b_id",
        F.round(dot_product(F.col("va"), F.col("vb")).cast("double")
                / (F.col("na") * F.col("nb")), 9).alias("cosine"))
    return scored.where(F.col("cosine") >= threshold) \
        .select("a_id", "b_id", "cosine")


def _bucket_expr(vec_col: str, n_planes: int, offset: int = 0) -> Column:
    """Hyperplane-LSH bucket key as one row-local expression.

    Plane j, dim i has weight (md5_int(j|i) % 2001 - 1000)/1000 —
    deterministic pseudo-random in [-1, 1], replayable in SQL. Bucket
    bit j = sign(vec · plane_(offset+j)); key = n_planes-bit int.
    `offset` selects a disjoint plane set per hash table in the
    multi-table OR-construction.
    """
    def plane_dot(j: int) -> Column:
        def weighted(x: Column, i: Column) -> Column:
            w = ((md5_int_expr(F.concat_ws("|", F.lit(str(offset + j)), i))
                  % 2001) - 1000) / 1000.0
            return (x.cast("double") * w).cast(DEC)
        return _dec_sum(F.transform(F.col(vec_col), weighted))

    bits = [F.when(plane_dot(j) > 0, F.lit(1 << j).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint")) for j in range(n_planes)]
    return functools.reduce(operator.add, bits)


def _plane_weights(n_planes: int, dims: int,
                   offset: int = 0) -> list[list[float]]:
    """The hyperplane matrix of `_bucket_expr`, CONSTANT-FOLDED: the
    weight (md5_int(j|i) % 2001 - 1000)/1000 depends only on the
    plane and dimension INDICES, never on data, so the md5 can run
    once per (j, i) at plan-build time instead of once per
    (row, j, i) at execute time — the expression form re-derived it
    4.1M times for a 2,000-vector corpus (measured 45-57s, the
    slowest query in the registry; folding + the smallness guards
    below took the face to 2.8s with bit-identical rows). hashlib's
    md5 of the same "j|i" string equals Spark's md5(); int(hex[:15],
    16) equals conv(substring(md5, 1, 15), 16, 10); the final
    / 1000.0 is the same IEEE double division — so each literal is
    bit-identical to what the expression computed (same zigzag-table
    precedent as the JPEG codec's generated tables)."""
    import hashlib
    return [[(((int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[:15],
                    16)) % 2001) - 1000) / 1000.0 for i in range(dims)]
            for j in range(offset, offset + n_planes)]


def _bucket_expr_folded(vec_col: str, n_planes: int, dims: int,
                        offset: int = 0) -> Column:
    """`_bucket_expr` with the plane weights as array LITERALS (see
    _plane_weights). `dims` must be >= the true vector length: the
    transform only visits real elements, so shorter vectors are fine,
    but a LONGER vector would index past the literal (NULL weight →
    NULL plane dot → bit 0) and the bucket would silently diverge
    from the expression form — so the expression FAILS LOUDLY on any
    row whose vector exceeds `dims` (assert_true is a row-local
    comparison, no extra pass, no shuffle). The decimal accumulation
    is unchanged (exact, order-independent, oracle-identical)."""
    ws = _plane_weights(n_planes, dims, offset)

    def plane_dot(j: int) -> Column:
        w = F.lit(ws[j])
        return _dec_sum(F.transform(
            F.col(vec_col),
            lambda x, i: (x.cast("double")
                          * F.element_at(w, i + 1)).cast(DEC)))

    bits = [F.when(plane_dot(j) > 0, F.lit(1 << j).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint")) for j in range(n_planes)]
    key = functools.reduce(operator.add, bits)
    ok = F.assert_true(
        F.size(F.col(vec_col)) <= F.lit(dims),
        F.concat(F.lit(f"lsh dims={dims} shorter than embedding length "),
                 F.size(F.col(vec_col)).cast("string")))
    # assert_true is NULL on success; the when() forces it to evaluate
    # before the bucket key is produced
    return F.when(ok.isNull(), key)


def lsh_buckets(embeddings: DataFrame, id_col: str, vec_col: str,
                n_planes: int = 16, dims: int | None = None) -> DataFrame:
    """Hyperplane-LSH bucket key per vector — computed entirely
    row-local (`transform` with index + decimal `aggregate`): the
    bucket assignment of a 100 TB embedding table is a map-only scan —
    the earlier explode formulation shuffled dims × planes × rows.
    Pass `dims` (the known embedding dimension) to use the
    constant-folded plane weights — same values, no per-row md5
    (and the plan stays map-only: no widen here, the pinned
    single-pass property of bucketing a 100 TB corpus).
    """
    expr = (_bucket_expr_folded(vec_col, n_planes, dims) if dims
            else _bucket_expr(vec_col, n_planes))
    return embeddings.select(id_col, expr.alias("bucket"))


def cosine_dedup_bucketed(embeddings: DataFrame, id_col: str, vec_col: str,
                          threshold: float = 0.95, n_planes: int = 8,
                          n_tables: int = 1,
                          dims: int | None = None) -> DataFrame:
    """LSH-bucketed embedding near-duplicate pairs — the 100 TB form.

    Stages, none quadratic in the corpus:
    1. map-only scan: (id, vec, norm, [bucket_0..bucket_L-1]) — one
       n_planes-bit key per hash table, disjoint hyperplane sets;
    2. posexplode to (table, bucket) — L rows per vector, still no
       shuffle;
    3. equi-join on (table, bucket) (a_id < b_id residual): pairing is
       bucket-local — candidate count is sum over tables of
       sum(|bucket|²), never n²;
    4. one dot product per candidate, threshold, then distinct to
       collapse pairs colliding in several tables.

    n_tables is the standard OR-construction recall lever: a pair is
    a candidate if it collides in ANY table, so recall rises as
    1-(1-p^k)^L while the per-table bucket count (2^n_planes) keeps
    each table's pairing sub-quadratic. Pairs colliding in no table
    are missed — the LSH recall tradeoff (measured in
    tests/test_pipeline.py; SCALE.md records the numbers).
    `cosine_pairs` remains the exact small-input verifier.
    """
    from .._sizing import is_provably_small, widen_if_underparallel
    buckets = F.array(*[
        (_bucket_expr_folded(vec_col, n_planes, dims, offset=t * n_planes)
         if dims else _bucket_expr(vec_col, n_planes, offset=t * n_planes))
        for t in range(n_tables)])
    # the plane-dot evaluation is interpreted (higher-order decimal
    # aggregate — no codegen for lambda bodies), and the self-join
    # below plans the signature subtree TWICE; widen a small scan so
    # the evaluation parallelizes, and persist the signatures when the
    # corpus is provably small (same optimizer-stats guard) so they
    # are evaluated ONCE. At 100 TB neither fires: the scan is wide
    # already and a corpus-sized persist would be worse than the
    # map-only recompute on each branch. The persist is deliberately
    # left for the session's cache manager to release (LRU under
    # memory pressure, or the caller's clearCache between measured
    # queries — the bench/driver harness does): the function returns
    # a LAZY frame, so there is no in-function point after the action
    # where an eager unpersist would be safe, and the guard bounds
    # the cache at cores x 128 MB of provably-small input.
    small = is_provably_small(embeddings)
    sigs = widen_if_underparallel(embeddings, id_col).select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(dot_product(F.col(vec_col), F.col(vec_col)).cast("double"))
        .alias("_norm"),
        buckets.alias("_buckets"))
    if small:
        sigs = sigs.persist()
    a = (sigs.select(F.col(id_col).alias("a_id"),
                     F.col(vec_col).alias("va"), F.col("_norm").alias("na"),
                     F.posexplode("_buckets").alias("ta", "ba")))
    b = (sigs.select(F.col(id_col).alias("b_id"),
                     F.col(vec_col).alias("vb"), F.col("_norm").alias("nb"),
                     F.posexplode("_buckets").alias("tb", "bb")))
    pairs = a.join(b, (F.col("ta") == F.col("tb"))
                   & (F.col("ba") == F.col("bb"))
                   & (F.col("a_id") < F.col("b_id")))
    scored = pairs.select(
        "a_id", "b_id",
        F.round(dot_product(F.col("va"), F.col("vb")).cast("double")
                / (F.col("na") * F.col("nb")), 9).alias("cosine"))
    return scored.where(F.col("cosine") >= threshold).distinct()
