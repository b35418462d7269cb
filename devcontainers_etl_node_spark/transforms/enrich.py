"""Star-join enrichment — the reference's transform stage, Spark-first.

The reference enriches the sales fact with two chained left merges against
pre-projected dimensions (``src/etl/etl.py:39-45``, J1+J2 in SURVEY §2.5).
The join strategy is left to AQE by default: dims under the broadcast
threshold become map-side broadcast joins (the fact never shuffles), and a
dim that is corpus-proportional (e.g. TPC-H customer = sf x 150k rows — TBs
at the 100 TB design point) falls back to a shuffled join instead of OOMing
the executors on a forced hint. Pass ``broadcast_dims=True`` only for a dim
you KNOW is bounded (nation/region-class constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_star(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, list[str]]],
    how: str = "left",
    broadcast_dims: bool = False,
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
