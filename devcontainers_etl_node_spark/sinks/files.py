"""File sinks: partitioned layouts replacing the reference's hand-built
prefix trees and MergeTree DDL.

- ``write_inventory_tree`` reproduces the reference's
  ``inventory/YYYY/MM/`` CSV layout (K6, ``minio_loader.py:108-115``) as
  Hive-style ``year=/month=`` partition directories — the idiomatic
  equivalent that downstream scans can partition-prune.
- ``write_lakehouse_table`` is the engine-side analogue of the ClickHouse
  MergeTree tables (K1, ``loaders.py:45-107``): monthly partitioning
  (``PARTITION BY toYYYYMM``) → ``partitionBy(ym)``; ``ORDER BY`` sort key
  → ``sortWithinPartitions`` (clusters data for min/max skipping in
  parquet, the same role as the MergeTree primary index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pay the shuffle ONCE at layout time so every
    subsequent equi-join/aggregation on ``bucket_cols`` between co-bucketed
    tables runs with NO Exchange (proven in tests/test_plans.py:
    test_bucketed_tables_join_without_exchange). ``sort_cols`` default to
    the bucket columns, giving sort-merge joins a free sort too.

    At 100 TB: size n_buckets so a bucket ≈ one executor task
    (rows/n_buckets × row width ≲ a few hundred MB); both join sides must
    use the SAME n_buckets and keys to co-locate.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )


def write_inventory_tree(df: DataFrame, root: str, mode: str = "overwrite") -> None:
    """CSV snapshot tree partitioned by year/month (K6)."""
    (
        df.withColumn("year", F.date_format("date", "yyyy"))
        .withColumn("month", F.date_format("date", "MM"))
        .write.mode(mode)
        .option("header", True)
        .partitionBy("year", "month")
        .csv(root)
    )


def write_lakehouse_table(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Parquet table with monthly partitions + clustered sort key (K1).

    At 100 TB this is the layout decision that matters: partition pruning
    on ym bounds the scan; sortWithinPartitions gives parquet row-group
    min/max statistics selectivity on the sort key (the MergeTree ORDER BY
    analogue) without a global sort.
    """
    (
        df.withColumn("ym", F.date_format(F.col(ts_col), "yyyyMM"))
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy("ym")
        .parquet(path)
    )
