from devcontainers_etl_node_spark.operators import (
    dedup,
    multimodal,
    similarity,
    skew,
    text,
)

__all__ = ["dedup", "similarity", "skew", "text", "multimodal"]
