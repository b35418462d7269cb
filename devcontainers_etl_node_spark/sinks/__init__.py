from devcontainers_etl_node_spark.sinks.files import write_inventory_tree, write_lakehouse_table

__all__ = ["write_inventory_tree", "write_lakehouse_table"]
