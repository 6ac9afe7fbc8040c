"""IVF (inverted-file) approximate nearest neighbour search.

The scale path for ANN beyond hyperplane LSH (similarity.lsh_buckets):
partition the vector space into cells around centroids, assign every
vector to its nearest centroid (the inverted file), then answer a
query by probing only the n_probe nearest cells — search cost drops
from O(N) to O(N · n_probe / n_cells) per query.

Centroids here are the deterministic seed set (vec_id < n_cells) so
every stage is exactly replayable in the DuckDB oracle; a production
deployment would run a few Lloyd iterations (each = one broadcast
join + groupBy-avg over the corpus) to refine them — the plumbing
below (assign → probe → cell-local scoring) is identical either way.

All distances go through the exact-decimal dot products of
pipeline/similarity.py, so assignment and ranking are bit-stable
across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import DEC, dot_product


def _with_sq_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.col(vec_col)
    return df.select(id_col, vec_col,
                     dot_product(v, v).cast("double").alias("n2"))


def ivf_centroids(embeddings: DataFrame, id_col: str, vec_col: str,
                  n_cells: int) -> DataFrame:
    """Deterministic seed centroids: (cell, cvec, cn2)."""
    return (_with_sq_norm(embeddings.where(F.col(id_col) < n_cells),
                          id_col, vec_col)
            .select(F.col(id_col).alias("cell"),
                    F.col(vec_col).alias("cvec"),
                    F.col("n2").alias("cn2")))


def ivf_assign(embeddings: DataFrame, id_col: str, vec_col: str,
               n_cells: int = 16) -> DataFrame:
    """Assign each vector to its nearest centroid by squared L2
    distance (ties → lowest cell id): the inverted file.

    Fully shuffle-free over the corpus: the n_cells centroids are
    folded into ONE array row (a trivial 16-row aggregate), broadcast,
    and the argmin runs as a per-row `aggregate` over that array
    inside the scan projection — assigning a 100 TB embedding table
    is a map-only pass, no window/groupBy shuffle of the corpus.
    Ties break to the lowest cell id (array is cell-sorted and the
    fold replaces only on strictly smaller distance), matching the
    oracle's ROW_NUMBER ... ORDER BY dist2, cell.
    """
    cents = ivf_centroids(embeddings, id_col, vec_col, n_cells)
    return _fold_assign(embeddings, cents, id_col, vec_col)


def _fold_assign(embeddings: DataFrame, cents: DataFrame, id_col: str,
                 vec_col: str,
                 carry: tuple[str, ...] = ()) -> DataFrame:
    """Map-only argmin of squared-L2 against a (cell, cvec, cn2)
    centroid set (see ivf_assign docstring). `carry` keeps extra
    columns (e.g. the vector and its norm) alongside the cell so
    downstream consumers need no join back to the corpus.

    The per-row fold (n_cells exact-decimal dot products) is
    INTERPRETED — higher-order aggregates never reach codegen — so
    the pass is CPU-bound far beyond its bytes, and a bench-scale
    embeddings table is ONE scan split: guarded core-width widen,
    same as the PQ/LSH/PCA faces. At 100 TB the guard leaves the
    zero-shuffle map-only assignment untouched."""
    from .._sizing import widen_if_underparallel
    e = _with_sq_norm(widen_if_underparallel(embeddings, id_col),
                      id_col, vec_col)
    carr = cents.agg(F.sort_array(F.collect_list(
        F.struct("cell", "cvec", "cn2"))).alias("cents"))

    def closer(acc, c):
        d = (F.col("n2") + c["cn2"]
             - 2 * dot_product(F.col(vec_col), c["cvec"]).cast("double"))
        return F.when(d < acc["dist2"],
                      F.struct(c["cell"].alias("cell"),
                               d.alias("dist2"))).otherwise(acc)

    best = F.aggregate(
        F.col("cents"),
        F.struct(F.lit(-1).cast("bigint").alias("cell"),
                 F.lit(float("inf")).alias("dist2")),
        closer)
    return (e.crossJoin(F.broadcast(carr))
            .select(id_col, *carry, best["cell"].alias("cell")))


def lloyd_centroids(embeddings: DataFrame, id_col: str, vec_col: str,
                    n_cells: int = 16) -> DataFrame:
    """One Lloyd (k-means) refinement of the seed centroids: centroid
    = coordinate-wise mean of its assigned vectors.

    The production IVF index build: each iteration is one map-only
    assignment pass + one (cell, pos) aggregate over the corpus —
    shuffle volume is dims × n_rows scalars, independent of n_cells.
    Means accumulate in exact decimal then divide in double, so the
    refined centroids replay bit-identically in the SQL oracle.
    Empty cells drop out (standard k-means degeneracy; the reference
    count here is n_cells=16 over uniform data, so all survive).
    """
    assign = ivf_assign(embeddings, id_col, vec_col, n_cells)
    joined = assign.join(embeddings.select(id_col, vec_col), id_col)
    pos = joined.select(
        "cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
    newc = (pos.groupBy("cell", "pos")
            .agg((F.sum(F.col("x").cast("double").cast(DEC)).cast("double")
                  / F.count("*")).alias("cx")))
    return (newc.groupBy("cell")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"]).alias("cvec"))
            .select("cell", "cvec",
                    dot_product(F.col("cvec"), F.col("cvec"))
                    .cast("double").alias("cn2")))


def ivf_lloyd_assign(embeddings: DataFrame, id_col: str, vec_col: str,
                     n_cells: int = 16) -> DataFrame:
    """Inverted file after one Lloyd refinement: assign every vector
    to its nearest REFINED centroid (same map-only fold)."""
    cents = lloyd_centroids(embeddings, id_col, vec_col, n_cells)
    return _fold_assign(embeddings, cents, id_col, vec_col)


def ivf_topk(embeddings: DataFrame, id_col: str, vec_col: str,
             query_id: int, n_cells: int = 16, n_probe: int = 4,
             k: int = 10) -> DataFrame:
    """IVF query: probe the n_probe cells nearest the query vector,
    cosine-rank only vectors assigned to those cells."""
    e = _with_sq_norm(embeddings, id_col, vec_col)
    cents = ivf_centroids(embeddings, id_col, vec_col, n_cells)
    q = (e.where(F.col(id_col) == query_id)
         .select(F.col(vec_col).alias("qvec"), F.col("n2").alias("qn2")))
    probe = (cents.crossJoin(F.broadcast(q))
             .select("cell",
                     (F.col("cn2") + F.col("qn2")
                      - 2 * dot_product(F.col("cvec"), F.col("qvec"))
                      .cast("double")).alias("dist2"))
             .orderBy("dist2", "cell").limit(n_probe)
             .select("cell"))
    # assignment carries (vec, n2) through the fold: the candidate set
    # needs NO join back to the corpus — the whole query is map-only
    # (scan → fold → broadcast-filter → score) until the final top-k
    assign = _fold_assign(embeddings, cents, id_col, vec_col,
                          carry=(vec_col, "n2"))
    cand = (assign.join(F.broadcast(probe), "cell")
            .where(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(q)))
    scored = cand.select(
        id_col,
        F.round(dot_product(F.col(vec_col), F.col("qvec")).cast("double")
                / (F.sqrt(F.col("n2")) * F.sqrt(F.col("qn2"))), 9)
        .alias("cosine"))
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def semdedup_flags(embeddings: DataFrame, id_col: str, vec_col: str,
                   n_cells: int = 16,
                   threshold: float = 0.35) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every vector whose cosine similarity to a lower-id
    cluster-mate exceeds the threshold (the lowest id in each
    near-duplicate group survives — the paper's 'keep one per
    semantic cluster' rule with a deterministic keeper).

    Scale design: cluster assignment is the map-only broadcast-
    centroid fold of ivf_assign (no corpus shuffle), and candidate
    pairs are CLUSTER-LOCAL — one shuffle on the cell id, never an
    all-pairs join. Pair volume is sum-of-squared-cell-sizes; a
    production run raises n_cells with corpus size (the paper uses
    k = O(sqrt N)) to keep cells bounded, which this plumbing takes
    as a parameter. The lower-id side joins RIGHT OUTER into the
    full assignment, so vectors with no lower-id cluster-mate keep a
    NULL best cosine without a third corpus scan — the whole plan is
    two scans, one cell-keyed shuffle, one aggregate. Returns every
    vector with its cell, the best cosine to a lower-id cluster-mate
    (NULL when it has none), and the drop flag.
    """
    cents = ivf_centroids(embeddings, id_col, vec_col, n_cells)
    a = _fold_assign(embeddings, cents, id_col, vec_col,
                     carry=(vec_col, "n2"))
    lo = a.select(F.col(id_col).alias("a_id"),
                  F.col(vec_col).alias("a_vec"),
                  F.col("n2").alias("a_n2"),
                  F.col("cell").alias("a_cell"))
    hi = a.select(F.col(id_col).alias("b_id"),
                  F.col(vec_col).alias("b_vec"),
                  F.col("n2").alias("b_n2"), "cell")
    cos = F.round(
        dot_product(F.col("a_vec"), F.col("b_vec")).cast("double")
        / (F.sqrt(F.col("a_n2")) * F.sqrt(F.col("b_n2"))), 9)
    best = (lo.join(hi, (F.col("a_cell") == F.col("cell"))
                    & (F.col("a_id") < F.col("b_id")), "right")
            .groupBy("b_id", "cell")
            .agg(F.max(cos).alias("best_lower_cosine")))
    return best.select(F.col("b_id").alias(id_col), "cell",
                       "best_lower_cosine",
                       F.coalesce(F.col("best_lower_cosine")
                                  >= F.lit(threshold),
                                  F.lit(False)).alias("is_dup"))
