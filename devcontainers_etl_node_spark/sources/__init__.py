from devcontainers_etl_node_spark.sources.files import (
    infer_date_from_filename,
    read_inventory_csv_tree,
)

__all__ = ["read_inventory_csv_tree", "infer_date_from_filename"]
