"""K1: ClickHouse DDL bootstrap, rendered from the engine's declared schemas.

Reference behavior (``src/etl/loaders.py:40-107``): ``_ensure_database()``
creates the target database, ``_create_tables()`` executes four
``CREATE TABLE IF NOT EXISTS`` MergeTree statements (dim_products,
dim_customers, fact_sales, fact_inventory) with PARTITION BY / ORDER BY.

Here the DDL is *rendered* from ``schemas.py`` StructTypes — one source of
truth for both the Spark write path and the warehouse schema — plus a
per-column ClickHouse type override map for the storage-level choices a
Spark schema cannot express (UInt32, UUID, LowCardinality, DateTime64
precision). ``bootstrap()`` executes the statements through any
caller-supplied executor (a ``clickhouse_connect`` client's ``command``,
a JDBC ``Statement::execute`` — no live warehouse exists in this
container, so execution is injected and unit tests assert the rendered
SQL against the reference layout).

Scale: DDL runs once on the driver; it is not a data path.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import types as T

from devcontainers_etl_node_spark.schemas import (
    DIM_CUSTOMERS,
    DIM_PRODUCTS,
    FACT_INVENTORY,
    FACT_SALES,
)

# Spark type → ClickHouse type (the generic fallback when no override is
# given; nullable Spark fields stay non-Nullable to mirror the reference,
# which declares every column bare and relies on ClickHouse defaults).
_SPARK_TO_CH: dict[type, str] = {
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.BooleanType: "UInt8",
    T.DateType: "Date",
    T.TimestampType: "DateTime64(6, 'UTC')",
    T.BinaryType: "String",
}


def _ch_type(field: T.StructField, overrides: dict[str, str]) -> str:
    if field.name in overrides:
        return overrides[field.name]
    dt = field.dataType
    if isinstance(dt, T.DecimalType):
        return f"Decimal({dt.precision},{dt.scale})"
    try:
        return _SPARK_TO_CH[type(dt)]
    except KeyError:  # arrays/structs never reach the warehouse sink
        raise TypeError(f"no ClickHouse mapping for Spark type {dt.simpleString()}") from None


def clickhouse_ddl(
    table: str,
    schema: T.StructType,
    order_by: Sequence[str],
    *,
    database: str = "commerce",
    partition_by: str | None = None,
    engine: str = "MergeTree",
    overrides: dict[str, str] | None = None,
) -> str:
    """Render one CREATE TABLE IF NOT EXISTS statement (reference
    ``loaders.py:47-104`` shape: columns, ENGINE, optional PARTITION BY,
    ORDER BY)."""
    ov = overrides or {}
    cols = ",\n    ".join(f"{f.name} {_ch_type(f, ov)}" for f in schema.fields)
    parts = [
        f"CREATE TABLE IF NOT EXISTS {database}.{table} (",
        f"    {cols}",
        ")",
        f"ENGINE = {engine}",
    ]
    if partition_by:
        parts.append(f"PARTITION BY {partition_by}")
    parts.append(f"ORDER BY {order_by[0] if len(order_by) == 1 else '(' + ', '.join(order_by) + ')'}")
    return "\n".join(parts)


def ensure_database_sql(database: str = "commerce") -> str:
    """Reference ``_ensure_database`` (loaders.py:40-43)."""
    return f"CREATE DATABASE IF NOT EXISTS {database}"


# The four reference tables (loaders.py:47-104), storage choices included:
# UInt32 ids, UUID event ids, LowCardinality dictionary columns, monthly
# partitions on the facts' time column.
REFERENCE_TABLES: dict[str, dict] = {
    "dim_products": dict(
        schema=DIM_PRODUCTS,
        order_by=("product_id",),
        partition_by=None,
        overrides={
            "product_id": "UInt32",
            "category": "LowCardinality(String)",
            "currency": "LowCardinality(String)",
        },
    ),
    "dim_customers": dict(
        schema=DIM_CUSTOMERS,
        order_by=("customer_id",),
        partition_by=None,
        overrides={
            "customer_id": "UInt32",
            "segment": "LowCardinality(String)",
        },
    ),
    "fact_sales": dict(
        schema=FACT_SALES,
        order_by=("ts", "event_id"),
        partition_by="toYYYYMM(ts)",
        overrides={
            "event_id": "UUID",
            "customer_id": "UInt32",
            "product_id": "UInt32",
            "qty": "Int32",
            "segment": "LowCardinality(String)",
            "category": "LowCardinality(String)",
        },
    ),
    "fact_inventory": dict(
        schema=FACT_INVENTORY,
        order_by=("date", "product_id", "warehouse_id"),
        partition_by="toYYYYMM(date)",
        overrides={
            "product_id": "UInt32",
            "warehouse_id": "LowCardinality(String)",
            "stock_units": "Int32",
        },
    ),
}


def reference_ddl(database: str = "commerce") -> dict[str, str]:
    """All four reference CREATE TABLE statements, keyed by table name."""
    return {
        name: clickhouse_ddl(
            name,
            spec["schema"],
            spec["order_by"],
            database=database,
            partition_by=spec["partition_by"],
            overrides=spec["overrides"],
        )
        for name, spec in REFERENCE_TABLES.items()
    }


def bootstrap(execute: Callable[[str], object], database: str = "commerce") -> list[str]:
    """Execute the full bootstrap (database + 4 tables) through `execute`
    (e.g. ``clickhouse_connect`` client ``.command``, or a JDBC statement
    runner). Returns the statements run, in order — the reference's
    ``_ensure_database(); _create_tables()`` sequence."""
    stmts = [ensure_database_sql(database), *reference_ddl(database).values()]
    for s in stmts:
        execute(s)
    return stmts
