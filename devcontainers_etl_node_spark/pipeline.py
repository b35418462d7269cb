"""The reference's end-to-end ETL pipeline, re-expressed as lazy Spark plans.

Reference flow (``src/etl/etl.py:56-67`` → ``:20-54``): eagerly extract
products/customers (Postgres), sales events (Kafka), inventory (S3 CSVs);
rename/cast into 2 dims + 2 facts; enrich the sales fact with two left
joins; chunk-insert into ClickHouse.

Here each stage is a DataFrame transform — nothing materializes until the
sink action, so Catalyst sees the whole pipeline at once (column pruning
reaches the sources; the reference's hand-rolled 4-column pre-projections
at etl.py:40,43 happen automatically, and are also kept explicit to bound
broadcast size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from devcontainers_etl_node_spark.transforms.enrich import enrich_star


def transform_star_schema(
    products: DataFrame,
    customers: DataFrame,
    sales_events: DataFrame,
    inventory: DataFrame,
) -> dict[str, DataFrame]:
    """The reference's transform_for_clickhouse (etl.py:20-54):
    dict-of-tables in, conformed star schema out.

    Input column contracts match the reference's raw sources:
    products/customers arrive with ``id``/``name`` (renamed here, P1/P2);
    sales events arrive with ids + qty + unit_price; inventory arrives
    date-typed with provenance.
    """
    dim_products = products.withColumnRenamed("id", "product_id").withColumnRenamed(
        "name", "product_name"
    )
    dim_customers = customers.withColumnRenamed("id", "customer_id")

    # J1 + J2: enrich the fact with customer then product payloads, dims
    # broadcast (etl.py:39-45). Left joins: unmatched ids → nulls, same as
    # the pandas merges.
    fact_sales = enrich_star(
        sales_events,
        {
            "customer_id": (dim_customers, ["external_id", "name", "segment"]),
            "product_id": (dim_products, ["sku", "product_name", "category"]),
        },
    ).withColumnRenamed("name", "customer_name")

    return {
        "dim_products": dim_products,
        "dim_customers": dim_customers,
        "fact_sales": fact_sales,
        "fact_inventory": inventory,
    }


def preview(tables: dict[str, DataFrame], n: int = 5) -> dict[str, int]:
    """The reference's report stage (etl.py:65-67): row counts + head-n.
    Returns the counts (the reference prints them)."""
    counts = {}
    for name, df in tables.items():
        counts[name] = df.count()
        df.show(n, truncate=False)
    return counts
