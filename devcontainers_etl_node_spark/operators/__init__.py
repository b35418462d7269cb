from devcontainers_etl_node_spark.operators import (
    dedup,
    graph,
    multimodal,
    rangejoin,
    similarity,
    skew,
    text,
)

__all__ = ["dedup", "graph", "rangejoin", "similarity", "skew", "text", "multimodal"]
