"""K1 DDL bootstrap: rendered ClickHouse DDL must match the reference's
table layout (src/etl/loaders.py:47-104) — table names, column order,
column types, engine, partitioning, ordering keys."""

import re

from devcontainers_etl_node_spark.sinks import ddl


def _parse(sql: str) -> dict:
    head, _, tail = sql.partition("(")
    m = re.match(r"CREATE TABLE IF NOT EXISTS (\S+)", head.strip())
    body, _, clauses = tail.partition("\n)\n")
    cols = []
    for line in body.strip().splitlines():
        name, _, ctype = line.strip().rstrip(",").partition(" ")
        cols.append((name, ctype))
    eng = re.search(r"ENGINE = (\w+)", clauses)
    part = re.search(r"PARTITION BY (.+)", clauses)
    order = re.search(r"ORDER BY (.+)", clauses)
    return {
        "table": m.group(1),
        "cols": cols,
        "engine": eng.group(1),
        "partition": part.group(1).strip() if part else None,
        "order": order.group(1).strip(),
    }


# the reference layout, transcribed from loaders.py:47-104
EXPECTED = {
    "dim_products": {
        "cols": [
            ("product_id", "UInt32"),
            ("sku", "String"),
            ("product_name", "String"),
            ("category", "LowCardinality(String)"),
            ("price", "Decimal(12,2)"),
            ("currency", "LowCardinality(String)"),
            ("created_at", "DateTime64(6, 'UTC')"),
        ],
        "partition": None,
        "order": "product_id",
    },
    "dim_customers": {
        "cols": [
            ("customer_id", "UInt32"),
            ("external_id", "String"),
            ("name", "String"),
            ("email", "String"),
            ("segment", "LowCardinality(String)"),
            ("created_at", "DateTime64(6, 'UTC')"),
        ],
        "partition": None,
        "order": "customer_id",
    },
    "fact_sales": {
        "cols": [
            ("event_id", "UUID"),
            ("ts", "DateTime64(6, 'UTC')"),
            ("customer_id", "UInt32"),
            ("product_id", "UInt32"),
            ("qty", "Int32"),
            ("unit_price", "Decimal(12,2)"),
            ("external_id", "String"),
            ("customer_name", "String"),
            ("segment", "LowCardinality(String)"),
            ("sku", "String"),
            ("product_name", "String"),
            ("category", "LowCardinality(String)"),
        ],
        "partition": "toYYYYMM(ts)",
        "order": "(ts, event_id)",
    },
    "fact_inventory": {
        "cols": [
            ("date", "Date"),
            ("product_id", "UInt32"),
            ("warehouse_id", "LowCardinality(String)"),
            ("stock_units", "Int32"),
            ("object", "String"),
        ],
        "partition": "toYYYYMM(date)",
        "order": "(date, product_id, warehouse_id)",
    },
}


def test_reference_ddl_matches_layout():
    rendered = ddl.reference_ddl("commerce")
    assert set(rendered) == set(EXPECTED)
    for name, sql in rendered.items():
        got = _parse(sql)
        exp = EXPECTED[name]
        assert got["table"] == f"commerce.{name}"
        assert got["engine"] == "MergeTree"
        assert got["cols"] == exp["cols"], name
        assert got["partition"] == exp["partition"], name
        assert got["order"] == exp["order"], name


def test_ensure_database_sql():
    assert ddl.ensure_database_sql("commerce") == "CREATE DATABASE IF NOT EXISTS commerce"


def test_bootstrap_executes_in_reference_order():
    ran: list[str] = []
    stmts = ddl.bootstrap(ran.append, database="analytics")
    assert ran == stmts
    assert ran[0] == "CREATE DATABASE IF NOT EXISTS analytics"
    assert [s.splitlines()[0] for s in ran[1:]] == [
        "CREATE TABLE IF NOT EXISTS analytics.dim_products (",
        "CREATE TABLE IF NOT EXISTS analytics.dim_customers (",
        "CREATE TABLE IF NOT EXISTS analytics.fact_sales (",
        "CREATE TABLE IF NOT EXISTS analytics.fact_inventory (",
    ]


def test_object_column_note():
    # fact_inventory carries the reference's S3-key provenance column
    sql = ddl.reference_ddl()["fact_inventory"]
    assert "object String" in sql
