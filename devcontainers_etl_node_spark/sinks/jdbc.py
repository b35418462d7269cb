"""JDBC sink: the reference's chunked ClickHouse insert (K3/K4), Spark-first.

Reference behavior (``loaders.py:151-186``): normalize → insert in
≤200 000-row chunks. Spark mapping: ``df.write.jdbc`` with ``batchsize`` —
partitions replace manual chunking, and N partitions insert concurrently
(the reference is single-connection).

The chunked-append wire path (table creation, batched executeBatch
inserts, append accumulation) is executed end-to-end against embedded
Derby by ``tests/test_jdbc_roundtrip.py``. DDL bootstrap (K1,
``loaders.py:40-107``) renders ClickHouse-dialect statements, so it runs
only against a live ClickHouse (rendering is pinned by tests/test_ddl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

from devcontainers_etl_node_spark.config import DEFAULT, EngineConfig
from devcontainers_etl_node_spark.transforms.conform import conform


def append_table(
    df: DataFrame,
    table: str,
    target_schema: T.StructType,
    aliases: dict[str, str] | None = None,
    config: EngineConfig | None = None,
) -> None:
    """Conform (K2) then append (K3/K4): the reference's normalize+insert
    path as one lazy plan. batchsize mirrors CH_CHUNK_ROWS."""
    cfg = config or DEFAULT
    conformed = conform(df, target_schema, aliases=aliases)
    (
        conformed.write.format("jdbc")
        .option("url", cfg.ch_url)
        .option("dbtable", table)
        .option("batchsize", cfg.ch_batch_rows)
        .option("isolationLevel", "NONE")
        .mode("append")
        .save()
    )
