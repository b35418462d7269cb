"""Distributed connected components (min-label propagation).

The step that turns near-duplicate PAIRS into duplicate CLUSTERS: each
node ends up labeled with the smallest node id reachable from it; one
row per cluster (the min) is then the canonical survivor.

Algorithm: iterative label propagation — every node adopts the minimum
label among itself and its neighbors until a fixpoint. Each iteration is
one join + one aggregation (both equi-keyed shuffles); the driver-side
loop only checks a convergence COUNT (iteration control, not data
movement). Convergence takes O(cluster diameter) iterations — near-dup
clusters are shallow (dups of dups), so typically 2-4. `max_iter` bounds
pathological chains; large-diameter graphs want the alternating
small-star/large-star variant, which keeps the same join-agg shape.

Lineage MUST be truncated every iteration: ``persist()`` caches blocks
but leaves the logical plan intact, and because each iteration references
the previous labels twice the un-truncated plan is ~2^k nodes after k
iterations — Catalyst re-analysis goes exponential in DRIVER CPU long
before any data problem (measured: a 13-iteration chain pegged the
driver for minutes; with checkpointing it is seconds). We use
``localCheckpoint(eager=True)`` (executor-local block storage). On a
production cluster with dynamic allocation, set a checkpoint dir
(``sc.setCheckpointDir``) and this function upgrades to reliable
``checkpoint()`` automatically — localCheckpoint'ed blocks die with
their executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark import StorageLevel


def _make_truncate(df: DataFrame):
    """Lineage truncation strategy for iterative loops (module docstring):
    localCheckpoint by default; with a checkpoint dir set, reliable
    checkpoint with a transient persist (avoids the double compute of
    checkpointing an uncached plan, then releases the blocks — the
    CacheManager holds strong refs, so an unpaired persist per iteration
    would leak for the session lifetime)."""
    reliable = df.sparkSession.sparkContext.getCheckpointDir() is not None

    def _truncate(d: DataFrame) -> DataFrame:
        if reliable:
            cached = d.persist(StorageLevel.MEMORY_AND_DISK)
            out = cached.checkpoint(eager=True)
            cached.unpersist()
            return out
        return d.localCheckpoint(eager=True)

    return _truncate


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, component) for every node that appears in an edge;
    `component` is the minimum node id in the component. Deterministic.
    Raises if `max_iter` rounds pass without convergence (wrong labels
    must never be returned silently — the caller can retry with a higher
    bound or switch to ``connected_components_star``).
    """
    _truncate = _make_truncate(edges)

    both = _truncate(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = _truncate(
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        # each node's new label: min over its own and all neighbors'
        # labels.  The self row is marked so the OLD label rides the
        # same aggregation — the convergence check is then a join-free
        # filter-count over the just-checkpointed result (one cheap job
        # reading cached blocks) instead of a second shuffle join per
        # iteration.
        self_rows = labels.select(
            "node", "component", F.lit(True).alias("is_self")
        )
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component", F.lit(False).alias("is_self"))
        )
        new_labels = _truncate(
            self_rows.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                # every node has exactly ONE self row, so this is its old label
                F.min(F.when(F.col("is_self"), F.col("component"))).alias("old_comp"),
            )
        )
        changed = new_labels.filter(F.col("component") != F.col("old_comp")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(graph diameter exceeds the bound) — raise max_iter or use "
        "connected_components_star (O(log n) rounds)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Components via alternating large-star / small-star contraction —
    the SCALE path: converges in O(log n) rounds regardless of graph
    diameter, where min-label propagation needs O(diameter) rounds (a
    100-hop chain costs 100 shuffles there, ~7 here). Same (node,
    component=min id) output contract as ``connected_components``.

    Per round (two map-reduce steps over the edge list, each one
    groupBy-min + equi-join — no driver-side data movement):

    - large-star: every node points its LARGER neighbors at the minimum
      of its neighborhood (incl. itself);
    - small-star: every node rewires itself and its smaller neighbors to
      that minimum.

    Both steps preserve connectivity and strictly shrink path lengths;
    at the fixpoint the edge set is a forest of stars rooted at each
    component's minimum. Convergence is detected by an edge-set
    signature (count + two independent hash sums — no full comparison
    join). Lineage is truncated per round exactly as in
    ``connected_components`` (see module docstring). Raises on
    non-convergence within `max_iter` rounds.
    """
    _truncate = _make_truncate(edges)

    # every node that appears in any edge — self-loop-only nodes must
    # still come out labeled (same contract as connected_components)
    all_nodes = _truncate(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # canonical current edge set: (a, b) pairs, self-loops dropped
    cur = _truncate(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def _sym(df: DataFrame) -> DataFrame:
        """Symmetric neighbor view: one row (u, v) per direction."""
        return (
            df.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .union(df.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .distinct()
        )

    def _signature(df: DataFrame):
        # bit_xor, not sum: ANSI mode (Spark 4 default) throws on long
        # overflow, and xor is order-independent with no overflow. Edges
        # are distinct so multiplicity can't cancel; two independent
        # hash lanes + the count make collisions negligible.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h1"),
            F.bit_xor(F.xxhash64("b", "a", F.lit(17))).alias("h2"),
        ).collect()[0]
        return (row.n, row.h1, row.h2)

    sig = _signature(cur)
    converged = False
    for _ in range(max_iter):
        both = _sym(cur)
        mins = both.groupBy("u").agg(F.min("v").alias("mv"))
        # large-star: larger neighbors v of u → min(neighborhood ∪ {u})
        ls = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.least("u", "mv").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the large-star output: each node u and its
        # smaller neighbors rewire to the min of the smaller neighborhood
        d = _sym(ls).filter(F.col("v") < F.col("u"))
        smins = d.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            d.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .distinct()
        )
        cur = _truncate(ss)
        new_sig = _signature(cur)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds "
            "— raise max_iter (expected rounds ~ log2(n))"
        )

    # fixpoint: stars (child → root). Roots label themselves; nodes with
    # no surviving edge (singletons incl. self-loop-only) label themselves.
    labeled = (
        cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .union(cur.select(F.col("b").alias("node"), F.col("b").alias("component")))
        .distinct()
    )
    return all_nodes.join(labeled, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


# Session-memoized component labels, the downstream twin of
# dedup.shared_ngram_pairs: dup_clusters and dup_canonical both run the
# SAME connected-components fixpoint over the SAME shared pair graph —
# the labels are edge-scale (tiny) and already lineage-truncated, so
# holding the final DataFrame for the session costs nothing and saves an
# O(diameter)-iteration recompute per consumer. Keyed by applicationId so
# a new session never sees dead checkpoint blocks.
_CC_MEMO: dict = {}
_CC_MEMO_MAX = 64
# monotone hit counter — the sweep (tools/verify_oracle.py) snapshots it
# around each entry to label memo-warm timings in the audit trail
MEMO_HITS = 0


def shared_components(
    edges: DataFrame,
    input_token: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """``connected_components`` memoized per (session, input, params).

    ``input_token`` identifies the edge set; callers MUST change it when
    the underlying pairs change (the dup-graph catalog family passes the
    sf directory, the same token it hands ``shared_ngram_pairs``).
    """
    key = (
        edges.sparkSession.sparkContext.applicationId,
        input_token,
        src,
        dst,
        max_iter,
    )
    hit = _CC_MEMO.get(key)
    if hit is not None:
        global MEMO_HITS
        MEMO_HITS += 1
        return hit
    out = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    if len(_CC_MEMO) >= _CC_MEMO_MAX:
        _CC_MEMO.clear()  # bounded: stale sessions' entries are dead weight
    _CC_MEMO[key] = out
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the directed (src, dst) edge list: a fixed number of
    power iterations with dangling-mass redistribution.

    Each iteration is one equi-join (ranks onto edges by source) + one
    aggregation (contributions by destination) — the same shuffle shape
    as connected_components, and the same lineage rule applies: truncate
    per iteration or Catalyst re-analysis goes exponential (module
    docstring). The dangling-node mass is a one-scalar collect per
    iteration (iteration control, not data movement). A fixed iteration
    count keeps the result deterministic up to float summation order —
    convergence-threshold loops compare floats across engines and are
    not reproducible.

    Returns (node, rank); ranks sum to 1 over all nodes that appear in
    any edge.
    """
    _truncate = _make_truncate(edges)

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = _truncate(
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # an empty graph has no ranks — return the empty (node, rank)
        # relation rather than dividing by the node count below
        return nodes.withColumn("rank", F.lit(0.0))
    out = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    e2 = _truncate(e.join(out, "s"))
    no_out = _truncate(nodes.join(out.withColumnRenamed("s", "node"), "node", "left_anti"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            e2.join(ranks.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        dangling_row = no_out.join(ranks, "node").agg(F.sum("rank").alias("m")).collect()[0]
        dangling = dangling_row.m or 0.0
        ranks = _truncate(
            nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.coalesce("c", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_hops: int = 10,
) -> DataFrame:
    """Multi-source BFS hop distances over the undirected (src, dst)
    graph: every node reachable from `sources` (a one-column DataFrame
    of node ids) within `max_hops` comes back as (node, dist) with its
    MINIMUM hop count. Unreachable nodes are absent.

    Per hop: one equi-join (frontier onto the symmetric edge list) + one
    anti-join (drop already-visited nodes) + a distinct — the frontier
    shuffle is hop-local, so cost follows the frontier size, never the
    graph. Lineage truncates per hop exactly as in connected_components
    (module docstring); the loop stops early when a frontier empties (a
    one-scalar count — iteration control, not data movement). `max_hops`
    bounds pathological chains AND mirrors the recursive-CTE oracle's
    cap, so both engines compute the identical bounded-BFS semantics.
    """
    _truncate = _make_truncate(edges)

    both = _truncate(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    visited = _truncate(
        sources.select(F.col(sources.columns[0]).alias("node")).distinct().withColumn(
            "dist", F.lit(0)
        )
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            both.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = _truncate(nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = _truncate(visited.unionByName(nxt))
        frontier = nxt
    return visited
