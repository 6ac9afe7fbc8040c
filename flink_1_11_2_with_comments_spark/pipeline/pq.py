"""Product quantization (PQ) approximate nearest neighbour search.

The third ANN family beside hyperplane-LSH (similarity.py) and IVF
(ivf.py): split the D-dim space into M sub-blocks, quantize each
block against its own K-entry codebook, and answer queries with
asymmetric distance computation (ADC) — the query's EXACT per-block
distances to every codebook entry are summed per candidate according
to the candidate's stored codes. Memory per vector drops from
D floats to M small ints; query cost from O(D·N) to O(D·K + M·N).

Scale design mirrors IVF: the codebook (K rows) folds into ONE
broadcast array row, ENCODING the 100 TB corpus is a map-only scan
(per-row argmin folds, no shuffle — same contract as
ivf._fold_assign), and the ADC scoring pass is again map-only with
the 1-row query distance table broadcast; only the final top-k
reduces. All block distances go through the exact-decimal discipline
of similarity.py so codes and scores replay bit-identically in the
DuckDB oracle.

Codebooks here are deterministic seed rows (vec_id < K), like
ivf_centroids; a production deployment would train them with the
same per-block Lloyd refinement ivf.lloyd_centroids demonstrates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import DEC, _dec_sum


def _block_d2(a: Column, b: Column) -> Column:
    """Exact squared L2 between two equal-length slices: differences
    in double (IEEE-exact for float inputs), squared, decimal-summed."""
    return _dec_sum(F.zip_with(
        a, b,
        lambda x, y: ((x.cast("double") - y.cast("double"))
                      * (x.cast("double") - y.cast("double"))).cast(DEC)))


def _codebook(embeddings: DataFrame, id_col: str, vec_col: str,
              n_codes: int):
    """K seed rows folded into one array<struct(code, vec)> row,
    code-sorted (deterministic fold order ⇒ deterministic argmin
    tie-break to the LOWEST code)."""
    return (embeddings.where(F.col(id_col) < n_codes)
            .select(F.struct(F.col(id_col).cast("int").alias("code"),
                             F.col(vec_col).alias("vec")).alias("e"))
            .agg(F.sort_array(F.collect_list("e")).alias("book")))


def pq_encode(embeddings: DataFrame, id_col: str, vec_col: str,
              n_blocks: int = 4, n_codes: int = 8,
              block_dim: int = 16,
              book: DataFrame | None = None) -> DataFrame:
    """Encode every vector as (id, code_0..code_{M-1}): per block, the
    codebook entry with the smallest exact squared L2 to the vector's
    slice (ties → lowest code). One broadcast of the K-row codebook
    (pass a prebuilt ``book`` to share it across stages — the ADC
    query reuses it instead of re-aggregating the corpus); the corpus
    pass is scan-side projections only — zero shuffle.

    Each block's K distances are computed ONCE into an
    array<struct<d2, code>> and the argmin is array_min (struct
    ordering compares d2 first, then code — exactly the ties→lowest-
    code rule); a fold whose condition AND branch both call the
    distance would evaluate it twice per improving entry (higher-
    order functions are interpreted: no CSE across When branches).
    Codebook entries are addressed with LITERAL element_at indices —
    several parallel higher-order transforms over the same array in
    one projection alias their lambda variables and come back wrong
    (see pq_adc_topk), and K entries are few anyway.

    The M x K block-distance folds are INTERPRETED (higher-order
    decimal aggregates never reach codegen), so the encode pass is
    CPU-bound far beyond what its bytes suggest — and a bench-scale
    embeddings table is ONE scan split, so it ran single-threaded.
    Guarded widen, same as the LSH/PCA faces: core-width repartition
    only when the optimizer KNOWS the input is small; at 100 TB the
    scan is already wide and encode keeps its zero-shuffle map-only
    shape."""
    from .._sizing import widen_if_underparallel
    if book is None:
        book = _codebook(embeddings, id_col, vec_col, n_codes)
    out = widen_if_underparallel(embeddings, id_col) \
        .crossJoin(F.broadcast(book))
    cols = [F.col(id_col)]
    for m in range(n_blocks):
        sub = F.slice(F.col(vec_col), m * block_dim + 1, block_dim)
        cand = F.array(*[
            F.struct(
                _block_d2(sub, F.slice(
                    F.element_at("book", c + 1)["vec"],
                    m * block_dim + 1, block_dim)).alias("d2"),
                F.element_at("book", c + 1)["code"].alias("code"))
            for c in range(n_codes)])
        cols.append(F.array_min(cand)["code"].alias(f"code_{m}"))
    return out.select(*cols)


def pq_adc_topk(embeddings: DataFrame, id_col: str, vec_col: str,
                query_id: int, k: int = 10, n_blocks: int = 4,
                n_codes: int = 8, block_dim: int = 16) -> DataFrame:
    """ADC query: exact per-block distances from the query to every
    codebook entry (M x K decimals, ONE row), broadcast onto the
    encoded corpus; each candidate's approximate distance is the sum
    of its codes' table entries. Map-only until the final top-k."""
    book = _codebook(embeddings, id_col, vec_col, n_codes)
    q = (embeddings.where(F.col(id_col) == query_id)
         .select(F.col(vec_col).alias("qvec"))
         .crossJoin(F.broadcast(book)))  # book shared with pq_encode below
    # qtab: array over blocks of array over codes of exact d2.
    # Codebook entries are addressed with LITERAL element_at indices
    # (not a transform lambda): several parallel higher-order
    # transforms over the same array in one projection alias their
    # named lambda variables and come back wrong — literal indexing
    # sidesteps the collision and there are only M x K entries anyway.
    qtab = q.select(F.array(*[
        F.array(*[
            _block_d2(
                F.slice(F.col("qvec"), m * block_dim + 1, block_dim),
                F.slice(F.element_at("book", c + 1)["vec"],
                        m * block_dim + 1, block_dim))
            for c in range(n_codes)])
        for m in range(n_blocks)]).alias("qtab"))
    enc = pq_encode(embeddings, id_col, vec_col, n_blocks, n_codes,
                    block_dim, book=book)
    scored = (enc.where(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(qtab))
              .select(
                  id_col,
                  F.round(sum(
                      F.element_at(F.element_at("qtab", m + 1),
                                   F.col(f"code_{m}") + 1)
                      for m in range(n_blocks)).cast(DEC), 9)
                  .cast("double").alias("approx_d2")))
    return scored.orderBy("approx_d2", id_col).limit(k)
