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


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, component) for every node that appears in an edge;
    `component` is the minimum node id in the component. Deterministic.
    """
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        """Materialize and CUT LINEAGE (see module docstring)."""
        if reliable:
            df = df.persist(StorageLevel.MEMORY_AND_DISK).checkpoint(eager=True)
            return df
        return df.localCheckpoint(eager=True)

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
        # each node's new label: min over its own and all neighbors' labels
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = _truncate(
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
