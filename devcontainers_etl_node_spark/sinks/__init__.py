from devcontainers_etl_node_spark.sinks.files import (
    write_bucketed_table,
    write_doc_store,
    write_inventory_tree,
    write_lakehouse_table,
)

__all__ = [
    "write_bucketed_table",
    "write_doc_store",
    "write_inventory_tree",
    "write_lakehouse_table",
]
