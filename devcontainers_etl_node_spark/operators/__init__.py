from devcontainers_etl_node_spark.operators import (
    dedup,
    graph,
    multimodal,
    packing,
    rangejoin,
    similarity,
    skew,
    text,
)

__all__ = ["dedup", "graph", "packing", "rangejoin", "similarity", "skew", "text", "multimodal"]
