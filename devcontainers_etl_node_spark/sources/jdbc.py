"""JDBC sources: the reference's Postgres extractor (S1/S5/S6), Spark-first.

The reference does a full single-connection ``SELECT *`` per table
(``extractors.py:34-39``). The Spark mapping adds what the reference
cannot do: partitioned parallel reads (``partitionColumn``/``numPartitions``
→ N concurrent range queries) and predicate/projection pushdown via the
JDBC DSv2 source.

No Postgres is reachable in this container, but the full wire path —
driver, SQL generation, partitioned range queries, query pushdown — is
executed end-to-end against embedded Derby (shipped in Spark's own jars)
by ``tests/test_jdbc_roundtrip.py``; only the URL differs in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from devcontainers_etl_node_spark.config import DEFAULT, EngineConfig


def read_table(
    spark: SparkSession,
    table: str,
    config: EngineConfig | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Scan a JDBC table (reference ``read_pg_table``, extractors.py:34-39).

    With ``partition_column`` (a numeric/date key, e.g. the PK), the scan
    becomes ``num_partitions`` parallel range queries — the 100 TB-side
    requirement the reference's single cursor can't meet.
    """
    cfg = config or DEFAULT
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.pg_url)
        .option("dbtable", table)
        .option("user", cfg.pg_user)
        .option("password", cfg.pg_password)
        .option("fetchsize", 10_000)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def read_query(spark: SparkSession, sql: str, config: EngineConfig | None = None) -> DataFrame:
    """Pushed-down query scan (reference S5/S6 projected/ordered/limited
    scans, kafka_loader.py:37-44 / minio_loader.py:56-75): the projection
    and limit run inside the database, not in Spark."""
    cfg = config or DEFAULT
    return (
        spark.read.format("jdbc")
        .option("url", cfg.pg_url)
        .option("query", sql)
        .option("user", cfg.pg_user)
        .option("password", cfg.pg_password)
        .load()
    )
