from devcontainers_etl_node_spark.generators.synthetic import (
    gen_customers,
    gen_inventory_snapshots,
    gen_products,
    gen_sales_events,
    seed_to_minimum,
)

__all__ = [
    "gen_products",
    "gen_customers",
    "gen_sales_events",
    "gen_inventory_snapshots",
    "seed_to_minimum",
]
