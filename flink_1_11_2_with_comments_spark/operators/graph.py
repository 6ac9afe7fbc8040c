"""Batch graph algorithms — SURVEY §2.11 (Gelly, low priority) and
the DataSet iteration model (DataSet.iterate/iterateDelta,
DataSet.java:1131,1179).

Reference: flink-libraries/flink-gelly/.../library/
{ConnectedComponents,PageRank}. Gelly runs these as delta iterations
inside the engine; Spark's equivalent is a driver-side loop over
DataFrames — each iteration is one join+aggregate stage, and
checkpoint/persist truncates the lineage so the plan doesn't grow
unboundedly (the scale concern for iteration on Spark).

Determinism: rank sums accumulate in DECIMAL and round to 9 digits
per iteration so results replay exactly in the SQL oracle.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._sizing import _UNKNOWN_STATS, est_bytes

DEC = "decimal(38,10)"


def _warn_not_converged(algo: str, max_iter: int) -> None:
    """Label propagation stopped at the iteration cap with changes still
    pending: the returned labels are NOT a fixed point (a component of
    diameter > max_iter keeps distinct labels). Silent truncation here
    diverged from full-closure oracles; make it loud."""
    warnings.warn(
        f"{algo}: hit max_iter={max_iter} before convergence — "
        f"results are not a fixed point; raise max_iter",
        RuntimeWarning, stacklevel=3)


def _superstep(df: DataFrame) -> DataFrame:
    """Superstep barrier: compute the round and TRUNCATE LINEAGE.

    DataSet.iterate materializes each superstep; the Spark analogue is
    localCheckpoint (plan becomes a LogicalRDD scan). persist() is NOT
    enough: every round references the previous labels twice (directly
    and via the per-round delta), so the analyzed logical tree doubles
    each round — 2^rounds subtrees — and analysis alone OOMs near
    round 10 even though execution would hit the cache. On a real
    cluster swap for df.checkpoint() (reliable storage) if executor
    loss during a long iteration must be recoverable.

    eager=False: the plan is truncated IMMEDIATELY (the DataFrame
    wraps the to-be-checkpointed RDD either way), but materialization
    waits for the round's convergence count — ONE job per round
    instead of two. Loops without a per-round action (pagerank's
    fixed iterations) collapse further: the whole chain executes in
    the final action, each level persisting as it computes.
    """
    return df.localCheckpoint(eager=False)


def cooccurrence_pairs(df: DataFrame, group_col: str,
                       item_col: str) -> DataFrame:
    """Unordered co-occurrence pairs (a < b) of items sharing a group —
    the edge build behind co-purchase graphs and market-basket rules
    (Gelly examples build the same projection with a reduce-on-order +
    cross within group; reference flink-gelly Graph.fromDataSet usage
    in the library examples).

    ONE shuffle: groupBy(group) -> array_sort(collect_set(item)) ->
    map-side pair expansion with higher-order array functions. The
    naive self-join on the group key shuffles the input TWICE (both
    join sides) and then joins; at 10x data that build dominated
    graph_k_core's scale ratio. Output: (group, a, b), one row per
    distinct pair per group — callers .distinct() for a graph edge
    set or count for association rules.

    Skew bound: a group of B distinct items expands to B(B-1)/2 pairs
    on ONE row of the grouped table, so the group-size distribution
    bounds task skew (TPC-H orders: <= 13 lineitems; document this
    bound before reusing on power-law baskets — a 100k-item group
    would put 5e9 pairs on one task, where the self-join build, which
    spreads them, is the right tool again).
    """
    return (df.groupBy(F.col(group_col).alias("__g"))
            .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
            .select(F.col("__g").alias(group_col),
                    F.explode(pair_expand("__items")).alias("__p"))
            .select(group_col, F.col("__p.a").alias("a"),
                    F.col("__p.b").alias("b")))


def pair_expand(array_col: str):
    """Column expression: all ordered-position pairs struct(a, b) from
    a SORTED array — the map-side kernel of cooccurrence_pairs,
    exposed so callers that already hold grouped item sets (e.g.
    market-basket arrays) expand pairs with zero extra shuffles.
    Pure higher-order array functions — stays in codegen, no UDF."""
    return F.expr(
        f"flatten(transform({array_col}, (x, i) -> "
        f"transform(slice({array_col}, i + 2, size({array_col})), "
        f"y -> struct(x AS a, y AS b))))")


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation: component id = min node id reachable.

    edges: (src bigint, dst bigint), treated as undirected. Returns
    (node, component). Converges in O(diameter) iterations; each
    iteration = one shuffle on node id. At scale, persist each label
    frame and use the large-star/small-star variant to cut rounds.
    """
    undirected = (edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src").persist())
    nodes = undirected.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iter):
        neighbor_min = (undirected
                        .join(labels, undirected.src == labels.node)
                        .groupBy(F.col("dst").alias("node2"))
                        .agg(F.min("component").alias("nbr_min")))
        # _superstep BEFORE the convergence count: one action both
        # materializes the round and truncates lineage; the changed
        # flag lives in the same frame, so the count is a filter over
        # the materialized RDD, not an old-vs-new re-join
        stepped = _superstep(
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select("node",
                    F.least("component",
                            F.coalesce("nbr_min", "component"))
                    .alias("component"),
                    (F.coalesce("nbr_min", "component")
                     < F.col("component")).alias("__changed")))
        labels = stepped.select("node", "component")
        if stepped.where("__changed").count() == 0:
            break
    else:
        _warn_not_converged("connected_components", max_iter)
    undirected.unpersist()
    return labels


def connected_components_delta(edges: DataFrame,
                               max_iter: int = 50) -> DataFrame:
    """Connected components with a frontier workset — the DataSet
    delta-iteration contract (DataSet.iterateDelta, DataSet.java:1179;
    Gelly ConnectedComponents runs exactly this: solution set +
    shrinking workset).

    Unlike the bulk variant, each round propagates labels only FROM
    nodes whose label changed last round: the per-round join touches
    |frontier| rows, not |V|, so total work is O(Σ|frontier_i|) —
    the property that makes high-diameter graphs tractable at 100 TB
    (bulk label propagation re-joins the full vertex set every
    round). _superstep per round keeps the plan depth constant (each
    round scans the previous round's materialized RDD, not its
    lineage).
    """
    # Loop parallelism derives from the INPUT's size — not from
    # spark.sql.shuffle.partitions: repartition("src") with no count
    # pins the session shuffle width (32 locally) onto the cached
    # edge table and, because the distinct below is already
    # partitioned by src, every round inherits that width for its
    # joins and checkpoint materializations. At sf0.1 that was
    # 32-task stages over 1.3k rows (pure scheduler overhead,
    # ~1.2s/round). The optimizer's size estimate is free (no job;
    # .rdd.getNumPartitions() would materialize AQE stages) and
    # scales with the data: ~128 MB of edges per loop partition, so
    # a 100 TB edge list still runs thousands wide.
    est = est_bytes(edges)
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if est < _UNKNOWN_STATS:
        n_part = max(1, min(2 * est // (128 << 20) + 1, 200_000))
        und = und.repartition(n_part, "src")
    else:
        # stats unknown (RDD-backed / checkpointed input reports the
        # defaultSizeInBytes sentinel, Long.MaxValue): an explicit
        # numPartitions repartition is AQE-exempt, so deriving a width
        # from the sentinel would pin a 200k-task loop onto a tiny
        # graph. Fall back to by-column repartition (AQE-coalescible).
        und = und.repartition("src")
    undirected = und.persist()
    labels = _superstep(
        undirected.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node")))
    frontier = labels  # round 0: every node just "changed"

    for _ in range(max_iter):
        msgs = (undirected
                .join(frontier, undirected.src == frontier.node)
                .groupBy(F.col("dst").alias("node2"))
                .agg(F.min("component").alias("cand")))
        # ONE superstep per round: new label + changed flag in the same
        # materialized frame; frontier and labels are then cheap
        # projections of the checkpointed RDD (constant plan depth,
        # half the per-round actions of a separate updates pass)
        stepped = _superstep(
            labels.join(msgs, labels.node == F.col("node2"), "left")
            .select("node",
                    F.least("component",
                            F.coalesce("cand", "component"))
                    .alias("component"),
                    (F.coalesce("cand", "component") < F.col("component"))
                    .alias("__changed")))
        frontier = stepped.where("__changed").select("node", "component")
        labels = stepped.select("node", "component")
        if stepped.where("__changed").count() == 0:
            break
    else:
        _warn_not_converged("connected_components_delta", max_iter)
    undirected.unpersist()
    return labels


def sssp(edges: DataFrame, source: int, max_iter: int = 10) -> DataFrame:
    """Single-source shortest paths, Bellman-Ford as a driver loop —
    Gelly SingleSourceShortestPaths (flink-libraries/flink-gelly/.../
    library/SingleSourceShortestPaths.java), Flink's scatter-gather
    iteration re-expressed as relax-join + min-aggregate rounds.

    edges: (src bigint, dst bigint, weight double), directed. Returns
    (node, distance) for reachable nodes. Each round = one shuffle
    (join on frontier) + one min-agg; rounds ≤ graph depth. _superstep
    truncates lineage growth across rounds — the scale concern for
    driver-side iteration.
    """
    dist = (edges.sparkSession
            .createDataFrame([(source, 0.0)], "node bigint, distance double"))
    for _ in range(max_iter):
        relaxed = (edges.join(dist, edges.src == dist.node)
                   .select(F.col("dst").alias("node"),
                           (F.col("distance") + F.col("weight"))
                           .alias("distance")))
        new_dist = _superstep(
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("distance").alias("distance")))
        changed = (new_dist.join(dist.withColumnRenamed("distance", "old"),
                                 "node", "left")
                   .where(F.col("old").isNull()
                          | (F.col("distance") != F.col("old")))
                   .count())
        dist = new_dist
        if changed == 0:
            break
    return dist


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank: rank = (1-d) + d·Σ contrib(in-nbrs).

    edges: (src, dst) directed. Simple variant (dangling mass
    dropped), rank rounded to 9 digits per iteration for
    engine-exact replay. Each iteration: one join + one aggregate.
    """
    out_deg = (edges.groupBy(F.col("src").alias("n"))
               .agg(F.count("*").alias("deg")).persist())
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct()
             .persist())
    ranks = nodes.withColumn("rank", F.lit(1.0))

    for _ in range(iterations):
        contribs = (edges
                    .join(ranks, edges.src == ranks.node)
                    .join(out_deg, edges.src == out_deg.n)
                    .select(F.col("dst"),
                            (F.col("rank") / F.col("deg")).alias("contrib")))
        summed = (contribs.groupBy(F.col("dst").alias("node2"))
                  .agg(F.sum(F.col("contrib").cast(DEC)).cast("double")
                       .alias("inflow")))
        # materialize + truncate each round so round i+1 scans the
        # round-i RDD, not an i-deep join lineage (plan depth stays
        # constant; the unpersisted form replans the whole history
        # every round)
        ranks = _superstep(
            nodes.join(summed, nodes.node == F.col("node2"), "left")
            .select("node",
                    F.round(F.lit(1.0) - damping
                            + damping * F.coalesce("inflow", F.lit(0.0)),
                            9).alias("rank")))
    # pagerank has no per-round action (fixed iterations), so with
    # lazy supersteps nothing has materialized yet — force the chain
    # ONCE while the out_deg/nodes caches are still live, otherwise
    # unpersisting here would make the final action re-aggregate
    # degrees and re-distinct nodes once per iteration level
    ranks = ranks.localCheckpoint(eager=True)
    out_deg.unpersist()
    nodes.unpersist()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles — Gelly TriangleEnumerator.java re-expressed
    relationally: orient every undirected edge a<b (each triangle
    once), enumerate wedges a<b<c with one self-join, close them with
    a second. Two shuffles total; at scale, pre-filter to the
    lower-degree endpoint orientation (standard degree-ordering trick)
    to bound wedge explosion on hubs.
    """
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    canon = (und.where(F.col("src") < F.col("dst"))
             .select(F.col("src").alias("a"), F.col("dst").alias("b"))
             .distinct())
    e2 = canon.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = canon.join(e2, canon.b == e2.b2)
    e3 = canon.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    closed = wedges.join(e3, (wedges.a == e3.a3) & (wedges.c == e3.c3))
    return closed.agg(F.count("*").alias("n_triangles"))


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Community detection by synchronous label propagation — Gelly's
    library algorithm (flink-gelly/.../library/LabelPropagation.java):
    every node starts with its own id as label; each round it adopts
    the MOST FREQUENT label among its neighbors, ties broken to the
    smallest label (deterministic, engine-replayable). Fixed iteration
    count so the oracle can unroll the identical rounds.

    Per round: one join (edges x labels), one (node, label) count with
    map-side partial aggregation, one per-node top-1 window — the
    DataSet.iterate superstep shape, lineage truncated per round
    (_superstep). Shuffle volume per round is |E| label pairs.

    Simple-graph semantics: the undirected edge set is DISTINCT-ed, so
    parallel edges do not weight a neighbor's label frequency. Gelly
    sends one message per edge (multigraph multiplicity counts); this
    matches the repo's SQL oracle instead (UNION dedupes) — alongside
    the smallest-label tie-break, the documented deviation.
    """
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst"))).distinct()
    labels = und.select(F.col("src").alias("node")) \
        .distinct().withColumn("lbl", F.col("node"))
    from pyspark.sql import Window as W
    for _ in range(iterations):
        freq = (und.join(labels, und.dst == labels.node)
                .groupBy(F.col("src").alias("n2"), "lbl")
                .agg(F.count("*").alias("c")))
        rn = F.row_number().over(
            W.partitionBy("n2").orderBy(F.desc("c"), "lbl"))
        labels = _superstep(
            freq.withColumn("rn", rn).where(F.col("rn") == 1)
            .select(F.col("n2").alias("node"), "lbl"))
    return labels


def salted_wedge_pairs(df: DataFrame, center: str, endpoint: str,
                       cap: int = 2048) -> DataFrame:
    """Wedge enumeration with hub salting: one row per (unordered
    endpoint pair, shared center vertex) — columns (a, b, center,
    center_degree), a < b.

    The naive self-join keyed by the center puts ALL d^2 candidate
    pairs of a degree-d hub on one task. Gelly caps this with
    adjacency-group splitting (flink-gelly/.../library/similarity/
    JaccardIndex.java — its GenerateGroupSpans/setGroupSize machinery);
    the Spark-first equivalent here is a bucket-pair block join: each
    (center, endpoint) row hashes into one of nb = ceil(d / cap)
    buckets, the left side replicates to block keys (i, j>=i) and the
    right to (i<=j, j), and the join shuffles on (center, i, j) — so a
    task sees at most ~cap^2 candidates and a hub's pair space spreads
    over nb(nb+1)/2 tasks. Same total work, no single-task hotspot.

    Pair-once proof: endpoints live in fixed buckets (hash of the
    value), so an unordered pair {x, y} with buckets bi < bj matches
    exactly the (bi, bj) block in exactly one orientation; equal
    buckets match both orientations and the va < vb predicate keeps
    one. Assumes a simple graph: (center, endpoint) rows are distinct.

    At testdata degrees nb == 1, so the plan degenerates to the plain
    wedge self-join; the cap path is pinned by tests with tiny caps.
    """
    e = df.select(F.col(center).alias("c"), F.col(endpoint).alias("v"))
    cdeg = e.groupBy("c").agg(F.count("*").alias("cd"))
    ann = (e.join(cdeg, "c")
           .withColumn("nb", F.greatest(
               F.lit(1), F.ceil(F.col("cd") / cap)).cast("int"))
           .withColumn("bk", F.pmod(F.xxhash64("v"),
                                    F.col("nb")).cast("int")))
    left = ann.select(
        "c", "cd", F.col("v").alias("va"), F.col("bk").alias("i"),
        F.explode(F.sequence(F.col("bk"), F.col("nb") - 1)).alias("j"))
    right = ann.select(
        F.col("c").alias("c2"), F.col("v").alias("vb"),
        F.explode(F.sequence(F.lit(0), F.col("bk"))).alias("i2"),
        F.col("bk").alias("j2"))
    pairs = left.join(
        right,
        (left.c == right.c2) & (left.i == right.i2)
        & (left.j == right.j2)
        & ((left.i < left.j) | (left.va < right.vb)))
    return pairs.select(
        F.least("va", "vb").alias("a"),
        F.greatest("va", "vb").alias("b"),
        F.col("c").alias("center"),
        F.col("cd").alias("center_degree"))


def hits(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """HITS (hubs & authorities) — Gelly's link-analysis library
    algorithm (flink-gelly/.../library/linkanalysis/HITS.java:66):
    authority(v) = sum of hub over in-neighbors, hub(v) = sum of
    authority over out-neighbors, each score vector L2-normalized
    per iteration. Fixed iteration count; every reduction is a
    DECIMAL sum and every iterate rounds (12 dp raw / 9 dp
    normalized), so the trajectory replays bit-exactly in the SQL
    oracle. Returns (node, hub, authority).

    Scale: per iteration two |E|-row join+aggregate stages and two
    1-row L2 norms broadcast back — the same superstep shape as
    pagerank; no .collect(), lineage truncated per round.

    Loop parallelism derives from the INPUT's size (the same
    stats-derived width as connected_components_delta, guide §2.2):
    without it every one of the six phase joins/aggregates inherited
    the session shuffle width — 32-task stages over a 1.3k-edge graph,
    pure scheduler overhead (measured 3.9 -> 2.4s best-of-7 at sf0.1
    from the width + the edge persist). The edge table is also
    persisted: each phase otherwise re-plans the full scan+union
    subtree, six scans of the fact tables per call. At 100 TB the
    stats-derived width keeps the loop thousands of partitions wide
    and the persist holds one |E|-row table that six consumers reuse.
    """
    est = est_bytes(edges)
    if est < _UNKNOWN_STATS:
        n_part = max(1, min(2 * est // (128 << 20) + 1, 200_000))
        edges = edges.repartition(n_part, "src")
    edges = edges.persist()
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct()
             .persist())
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = nodes.withColumn("auth", F.lit(1.0))

    def _phase(scores: DataFrame, score_col: str, edge_from: str,
               edge_to: str, out_col: str) -> DataFrame:
        raw = (edges.join(scores, edges[edge_from] == scores.node)
               .groupBy(F.col(edge_to).alias("n2"))
               .agg(F.round(F.sum(F.col(score_col).cast(DEC)), 12)
                    .cast("double").alias("raw")))
        filled = (nodes.join(raw, nodes.node == F.col("n2"), "left")
                  .select("node", F.coalesce("raw", F.lit(0.0))
                          .alias("raw")))
        nrm = filled.agg(
            F.round(F.sqrt(F.round(F.sum((F.col("raw") * F.col("raw"))
                                         .cast(DEC)), 12)
                           .cast("double")), 12).alias("nrm"))
        return _superstep(
            filled.crossJoin(F.broadcast(nrm))
            .select("node", F.round(F.col("raw") / F.col("nrm"), 9)
                    .alias(out_col)))

    for _ in range(iterations):
        auth = _phase(hub, "hub", "src", "dst", "auth")
        hub = _phase(auth, "auth", "dst", "src", "hub")
    out = (hub.join(auth.select(F.col("node").alias("n3"), "auth"),
                    hub.node == F.col("n3"))
           .select("node", "hub", F.col("auth").alias("authority"))
           .localCheckpoint(eager=True))
    nodes.unpersist()
    edges.unpersist()
    return out


def summarize(edges: DataFrame, groups: DataFrame) -> dict:
    """Graph summarization — Gelly's Summarization library algorithm
    (flink-gelly/.../library/Summarization.java:70): collapse every
    vertex into its group value; emit one summary vertex per group
    with its member count and one summary edge per (source group,
    target group) with the count of original edges it represents.

    groups: (node, grp). Returns {'vertices': DF(grp, n_members),
    'edges': DF(src_grp, dst_grp, n_edges)} — two broadcast joins
    (the group map is vertex-sized but grp cardinality is small;
    at 100 TB keep it a plain shuffle join if the map outgrows
    broadcast) and two aggregates.
    """
    vertices = groups.groupBy("grp").agg(F.count("*").alias("n_members"))
    g1 = groups.select(F.col("node").alias("ns"), F.col("grp").alias("src_grp"))
    g2 = groups.select(F.col("node").alias("nd"), F.col("grp").alias("dst_grp"))
    sedges = (edges.join(g1, edges.src == F.col("ns"))
              .join(g2, edges.dst == F.col("nd"))
              .groupBy("src_grp", "dst_grp")
              .agg(F.count("*").alias("n_edges")))
    return {"vertices": vertices, "edges": sedges}


def pregel(edges: DataFrame, initial: DataFrame, send_msg,
           merge_msg, update, max_iter: int = 20,
           algo: str = "pregel") -> DataFrame:
    """Vertex-centric (Pregel / scatter-gather) iteration — the
    abstraction Gelly's library algorithms are built ON
    (flink-gelly/.../pregel/VertexCentricIteration.java:88 and
    spi/ScatterGatherIteration.java:90), re-expressed as a
    frontier-delta DataFrame loop.

    edges   : (src, dst, ...payload) directed.
    initial : (node, value) — the initially-active vertex set.
    send_msg: Column over the scatter join (edge payload columns +
              the source vertex's `value`) — the message sent to dst.
    merge_msg: aggregation fn, e.g. ``lambda c: F.min(c)`` — the
              combiner applied per destination (runs map-side too).
    update  : fn(old_value, merged_msg) -> new value Column; old is
              NULL on first activation. Invoked ONLY for vertices
              whose merged inbox is non-null (the Pregel contract:
              compute() runs where messages arrived); a vertex with
              no inbound message keeps its old value untouched, so
              non-null-identity updates (sum-accumulate, last-writer)
              are safe. Messages themselves must be non-null — a
              null merged message is indistinguishable from "no
              message" and is treated as such.
    Per superstep: ONLY vertices whose value changed scatter (the
    delta-iteration workset contract, DataSet.iterateDelta /
    DataSet.java:1179) — one |frontier-out-edges| join + one
    combiner-aggregated shuffle + one state merge; lineage truncated
    per round. Terminates when the frontier empties (or max_iter,
    loudly).
    """
    state = initial
    frontier = initial
    for _ in range(max_iter):
        msgs = (edges.join(frontier.select(F.col("node").alias("__s"),
                                           "value"),
                           edges.src == F.col("__s"))
                .select(F.col("dst").alias("node"),
                        send_msg.alias("msg")))
        inbox = msgs.groupBy("node").agg(merge_msg(F.col("msg"))
                                         .alias("msg"))
        merged = (state.join(inbox, "node", "full")
                  .select("node",
                          F.col("value").alias("__old"),
                          F.when(F.col("msg").isNull(), F.col("value"))
                          .otherwise(update(F.col("value"),
                                            F.col("msg")))
                          .alias("value")))
        merged = _superstep(merged)
        frontier = (merged.where(F.col("__old").isNull()
                                 | (F.col("value") != F.col("__old")))
                    .select("node", "value"))
        state = merged.select("node", "value")
        if frontier.limit(1).count() == 0:
            break
    else:
        if frontier.limit(1).count() > 0:
            _warn_not_converged(algo, max_iter)
    return state


def k_core_pairs(pairs: DataFrame, k: int, max_iter: int = 30,
                 peels_per_job: int = 4) -> DataFrame:
    """k_core over the HALF-representation: ``pairs`` holds each
    undirected edge ONCE as (a, b), already distinct. Semantically
    identical to k_core(pairs ∪ reversed(pairs)) but materializes
    |E| rows instead of 2|E|: the edge-list checkpoint write was the
    dominant 10x-scaling cost of the full-orientation variant (the
    24M-row write alone cost more than the whole peel at 10x sf0.1),
    and every consumer of both orientations can read the half cache
    twice instead. Same Gelly contract and same unrolled-SQL oracle
    as k_core (DataSet.iterateDelta, DataSet.java:1179).

    Per-round work, minimized two ways vs the r12 shape:

    - ONE pass over the cached half-edge list per round: both
      orientations come out of a single explode scan probed against
      the broadcast peel delta (the r12 shape ran two separate
      broadcast joins — two full cache scans — for the same 2|E|
      probes). The |E| cache scan is the dominant linear cost of a
      round, so this halves it.
    - The per-round driver action is FOLDED into the peel: a peel is
      idempotent past its fixpoint (removing nothing decrements
      nothing), so rounds are chained LAZILY (_superstep eager=False
      keeps each round's plan flat) and ONE count at the end of a
      batch both materializes the whole chain and answers the
      convergence question. Speculative rounds inside a batch never
      see an exact delta size, so they only run while the PROVABLE
      bound fits the broadcast budget: a peeled vertex has
      in-subgraph degree < k, so the next delta — a subset of the
      peeled set's alive neighbors — has at most |delta| * (k-1)
      rows. Batch entry sizes are exact (counted at the previous
      batch boundary); a first round that peels half the graph
      shuffle-joins instead of broadcasting.

    Trailing speculative rounds past the fixpoint are no-ops (empty
    build side; AQE's empty-relation propagation skips the edge
    scan), costing only the |V_alive| degree-table rewrite — which is
    exactly what lets the SQL oracle unroll a fixed round count.
    """
    pairs = _superstep(pairs.select("a", "b"))
    deg = (pairs.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("d")))
    deg = _superstep(deg)
    broadcast_rows = 5_000_000

    def peel(deg: DataFrame, rem: DataFrame) -> DataFrame:
        # single scan of the half cache: explode both orientations,
        # probe the broadcast delta, count decrements per survivor
        exp = (pairs.select(F.explode(F.array(
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
        )).alias("e")).select("e.u", "e.v"))
        dec = (exp.join(rem, exp.u == rem.node)
               .groupBy(F.col("v").alias("node"))
               .agg(F.count("*").alias("__dec")))
        return _superstep(
            deg.where(F.col("d") >= k)
            .join(dec, "node", "left")
            .select("node",
                    (F.col("d") - F.coalesce(F.col("__dec"),
                                             F.lit(0))).alias("d")))

    rounds = 0
    # this count is the ONLY driver action per batch: it materializes
    # the lazily-checkpointed chain AND measures the next delta
    n_below = deg.where(F.col("d") < k).count()
    while n_below > 0 and rounds < max_iter:
        removed = deg.where(F.col("d") < k).select("node")
        rem = (F.broadcast(removed) if n_below <= broadcast_rows
               else removed)
        deg = peel(deg, rem)
        rounds += 1
        # speculative rounds: no action between peels; broadcast is
        # safe while the worst-case delta bound fits the budget
        bound = n_below * max(k - 1, 1)
        batched = 1
        while (batched < peels_per_job and rounds < max_iter
               and bound <= broadcast_rows):
            removed = deg.where(F.col("d") < k).select("node")
            deg = peel(deg, F.broadcast(removed))
            rounds += 1
            batched += 1
            bound *= max(k - 1, 1)
        n_below = deg.where(F.col("d") < k).count()
    if n_below > 0:
        _warn_not_converged("k_core", max_iter)
    return deg.select("node",
                      F.col("d").cast("bigint").alias("core_degree"))


def k_core(und: DataFrame, k: int, max_iter: int = 30) -> DataFrame:
    """k-core decomposition for a fixed k: iteratively peel vertices
    of in-subgraph degree < k until a fixpoint — Gelly's iterative
    vertex-removal pattern (the KCore example built on repeated
    filterOnVertices; same DataSet.iterate contract as the library
    algorithms, reference flink-gelly Graph.filterOnVertices +
    DataSet.java:1105 iterate).

    Input: UNDIRECTED edge list (src, dst) with both orientations
    present. Output: (node, core_degree) — the vertices of the k-core
    and their degree WITHIN the core.

    Scale (delta-degree discipline, the reference's delta-iteration
    contract — DataSet.iterateDelta, DataSet.java:1179): degrees are
    aggregated from the full edge list ONCE; every subsequent round
    touches only edges incident to the REMOVED delta — join the edge
    list against the just-peeled vertex set (broadcast when small,
    which it is after round 1) and DECREMENT the survivors' counters,
    instead of re-joining the full edge list twice and re-counting
    from scratch (the pre-r11 shape, whose per-round cost was
    rounds x |E| and benchmarked 4.7x at 10x data). Per-round work is
    now O(|edges incident to delta|) plus a map-side broadcast probe
    of the materialized edge list; the degree table (|V_alive| rows)
    is the only per-round shuffle. _superstep truncates lineage per
    round. Convergence: the alive set only shrinks, so termination is
    guaranteed; rounds are bounded by the peeling depth, and extra
    rounds past the fixpoint are no-ops (idempotent — which is what
    lets the SQL oracle UNROLL a fixed round count). The final
    counters ARE the in-core degrees (full degree minus peeled
    neighbors), so no recompute pass is needed.
    """
    und = _superstep(und)  # materialize the edge list once: every
    # round probes it, and rebuilding it would re-run whatever
    # self-join produced it
    deg = (und.groupBy(F.col("src").alias("node"))
           .agg(F.count("*").alias("d")))
    deg = _superstep(deg)
    # broadcast the peeled delta only while it is provably small; a
    # first round that peels half the graph must shuffle-join instead
    broadcast_rows = 5_000_000
    for _ in range(max_iter):
        # deg is localCheckpointed, so this filter is a cheap
        # re-derivation — no extra materialization job for the delta
        removed = deg.where(F.col("d") < k).select("node")
        # one job per round: the emptiness test IS the size we need
        n_removed = removed.count()
        if n_removed == 0:
            break
        rem_dst = removed.withColumnRenamed("node", "dst")
        if n_removed <= broadcast_rows:
            rem_dst = F.broadcast(rem_dst)
        dec = (und.join(rem_dst, "dst")
               .groupBy(F.col("src").alias("node"))
               .agg(F.count("*").alias("__dec")))
        deg = (deg.where(F.col("d") >= k)
               .join(dec, "node", "left")
               .select("node",
                       (F.col("d") - F.coalesce(F.col("__dec"),
                                                F.lit(0))).alias("d")))
        deg = _superstep(deg)
    else:
        if deg.where(F.col("d") < k).limit(1).count() > 0:
            _warn_not_converged("k_core", max_iter)
    return deg.select("node", F.col("d").cast("bigint").alias("core_degree"))
