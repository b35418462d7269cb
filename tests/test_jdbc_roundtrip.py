"""Executed JDBC wire roundtrip against embedded Derby (S1/S3/K3/S5 wire halves).

The reference's extract/load paths (``src/etl/extractors.py:34-39`` full-table
scan, ``src/etl/loaders.py:151-186`` chunked insert, the projected catalog
scans) could previously be pinned only at plan level — no Postgres/ClickHouse
is reachable in this sandbox. Spark, however, ships Apache Derby in its own
jars (it backs the Hive metastore), so an EMBEDDED Derby database exercises
the exact same code paths — ``sinks.jdbc.append_table`` (conform + batchsize
write) and ``sources.jdbc.read_table`` / ``read_query`` (full, partitioned,
and pushed-down scans) — through a real JDBC driver, real SQL generation by
Spark's JdbcDialect, and real batched inserts.

Only the URL differs from production: the builders take it from EngineConfig,
which is the point — the same plan runs against Postgres/ClickHouse by
changing one config value.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.config import EngineConfig
from devcontainers_etl_node_spark.generators.synthetic import gen_products
from devcontainers_etl_node_spark.schemas import DIM_PRODUCTS
from devcontainers_etl_node_spark.sinks import jdbc as jdbc_sink
from devcontainers_etl_node_spark.sources import jdbc as jdbc_source

N_ROWS = 500


@pytest.fixture(scope="module")
def derby_cfg(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "etldb"
    url = f"jdbc:derby:{db};create=true"
    # pg_url feeds the source builders, ch_url the sink builder — point
    # both at the same embedded database so write→read is one store.
    return EngineConfig(pg_url=url, ch_url=url, ch_batch_rows=100)


@pytest.fixture(scope="module")
def loaded(spark, derby_cfg):
    """Write dim_products once through the chunked-insert sink; the write
    itself is part of what is under test."""
    df = gen_products(spark, N_ROWS, seed=7)
    jdbc_sink.append_table(df, "dim_products", DIM_PRODUCTS, config=derby_cfg)
    # the conformed frame is the ground truth the table must echo back
    from devcontainers_etl_node_spark.transforms.conform import conform

    return conform(df, DIM_PRODUCTS)


def _canon(df):
    cols = [f.name for f in DIM_PRODUCTS.fields if f.name != "created_at"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_full_scan_roundtrip(spark, derby_cfg, loaded):
    """S1 wire half: what the batched JDBC write stored, the full-table
    scan returns byte-equal (created_at excluded: Derby stores it fine but
    current_timestamp ground truth is re-evaluated per action)."""
    back = jdbc_source.read_table(spark, "dim_products", config=derby_cfg)
    assert back.count() == N_ROWS
    assert _canon(back) == _canon(loaded)


def test_partitioned_scan_matches_single_cursor(spark, derby_cfg, loaded):
    """S1 partitioned half: 4 parallel range queries return the same rows
    as the single-cursor scan — the capability the reference's one-cursor
    extractor lacks."""
    back = jdbc_source.read_table(
        spark,
        "dim_products",
        config=derby_cfg,
        partition_column="product_id",
        num_partitions=4,
        lower_bound=1,
        upper_bound=N_ROWS + 1,
    )
    assert back.rdd.getNumPartitions() == 4
    assert _canon(back) == _canon(loaded)


def test_projected_query_pushdown(spark, derby_cfg, loaded):
    """S5 wire half: read_query ships the projection + predicate to the
    database; Spark sees only the two requested columns."""
    # Spark's JDBC writer creates quoted (case-exact) identifiers, so the
    # hand-written SQL quotes them too — as it would against Postgres.
    back = jdbc_source.read_query(
        spark,
        'SELECT "product_id", "category" FROM dim_products'
        ' WHERE "product_id" <= 50',
        config=derby_cfg,
    )
    assert back.columns == ["product_id", "category"]
    assert back.count() == 50
    truth = {
        (r["product_id"], r["category"])
        for r in loaded.filter(F.col("product_id") <= 50).collect()
    }
    assert {(r[0], r[1]) for r in back.collect()} == truth


def test_append_accumulates(spark, derby_cfg, loaded):
    """K3 wire half: a second chunked append lands after the first —
    mode=append, batchsize honored (ch_batch_rows=100 < N_ROWS forces
    multiple executeBatch roundtrips)."""
    more = gen_products(spark, 50, seed=11).withColumn(
        "product_id", F.col("product_id") + N_ROWS
    )
    jdbc_sink.append_table(more, "dim_products", DIM_PRODUCTS, config=derby_cfg)
    back = jdbc_source.read_table(spark, "dim_products", config=derby_cfg)
    assert back.count() == N_ROWS + 50
    assert back.agg(F.max("product_id")).first()[0] == N_ROWS + 50
