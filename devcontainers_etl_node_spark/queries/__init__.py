from devcontainers_etl_node_spark.queries.catalog import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
