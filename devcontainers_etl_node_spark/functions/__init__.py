from devcontainers_etl_node_spark.functions.udfs import norm_text

__all__ = ["norm_text"]
