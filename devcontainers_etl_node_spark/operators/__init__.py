from devcontainers_etl_node_spark.operators import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
