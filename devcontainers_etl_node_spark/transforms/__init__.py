from devcontainers_etl_node_spark.transforms.conform import conform
from devcontainers_etl_node_spark.transforms.enrich import enrich_star

__all__ = ["conform", "enrich_star"]
