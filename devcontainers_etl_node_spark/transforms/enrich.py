"""Star-join enrichment — the reference's transform stage, Spark-first.

The reference enriches the sales fact with two chained left merges against
pre-projected dimensions (``src/etl/etl.py:39-45``, J1+J2 in SURVEY §2.5).
Here the dims are explicitly broadcast: dimensions are small relative to the
fact, so at 100 TB the fact table never shuffles — each executor holds the
dim hash maps and the join is map-side. If a dim outgrows the broadcast
threshold, drop the hint and let AQE pick sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_star(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, list[str]]],
    how: str = "left",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Left-join ``fact`` against each dim on its key.

    dims: {join_key: (dim_df, payload_columns)} — payload columns are
    pre-projected (reference etl.py:40,43; Catalyst would prune anyway,
    the explicit select keeps broadcast sizes minimal).
    """
    out = fact
    for key, (dim, payload) in dims.items():
        side = dim.select(key, *payload)
        if broadcast_dims:
            side = F.broadcast(side)
        out = out.join(side, on=key, how=how)
    return out
