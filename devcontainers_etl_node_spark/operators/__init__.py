from devcontainers_etl_node_spark.operators import (
    dedup,
    multimodal,
    rangejoin,
    similarity,
    skew,
    text,
)

__all__ = ["dedup", "rangejoin", "similarity", "skew", "text", "multimodal"]
