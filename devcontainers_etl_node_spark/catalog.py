"""Corpus catalog: named DataFrames over the driver's parquet tables.

The reference models 'the data' as ``Dict[str, pd.DataFrame]``
(``src/etl/etl.py:11-18``). The Spark-native equivalent is a dict of lazy
DataFrames / temp views — scans stay unmaterialized until an action, so
Catalyst prunes columns and pushes filters into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.schemas import CORPUS_TABLES

# Schema memo: `spark.read.parquet` without a schema pays footer
# reads + schema inference on EVERY call (measured 75-140 ms per table
# at sf0.1); with an explicit schema the same call is ~20 ms. The memo
# key includes the file's (mtime_ns, size) fingerprint, so a table
# regenerated in place with a different schema re-infers instead of
# silently misreading through a stale explicit schema (the stat call is
# ~microseconds — noise next to the ~20 ms scan construction). Caching
# the DATAFRAME instead would be faster still (0.4 ms) but reuses
# attribute ids — two table() calls in one query then form an ambiguous
# self-join (measured: the Q21-shape queries break). Schemas are plain
# immutable Python values, so a module dict is safe across sessions.
_SCHEMA_MEMO: dict[tuple[str, int, int], object] = {}


def clear_schema_memo() -> None:
    """Drop every memoized schema — for test/regeneration flows that
    rewrite corpus files and want re-inference without a process bounce
    (the stat fingerprint already handles the common rewrite case)."""
    _SCHEMA_MEMO.clear()


def _schema_key(path: str) -> tuple[str, int, int]:
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        # non-local path (s3a:// etc.) or a directory-per-table layout a
        # caller points at: fall back to path-only keying (the original
        # immutable-corpus assumption)
        return (path, 0, 0)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one corpus table. Column pruning/filter pushdown apply.

    events.parquet has shipped with two physical encodings of ``ts``
    across corpus generations: TIMESTAMP(NANOS) (which Spark's parquet
    reader rejects unless nanos are read as long via the legacy conf) and
    plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark reads
    as TIMESTAMP_NTZ). Both are normalized here to a microsecond
    TimestampType in the UTC session zone — the exact semantics DuckDB
    gives the same file — so every downstream query sees one stable type.

    The session timezone is pinned to UTC here (runtime-settable) because
    the engine's timestamp semantics are UTC throughout (the reference
    UTC-normalizes at src/etl/loaders.py:128-133) — this keeps results
    correct even when the caller built the SparkSession with a local tz.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # set on every call: the legacy conf is consulted when the scan
        # EXECUTES, not only when the schema was first inferred
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = _schema_key(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = schema
    # explicit schema skips footer reads/inference (~5x cheaper scan
    # construction) while every call still gets FRESH attribute ids —
    # self-joins across two table() calls stay unambiguous
    df = spark.read.schema(schema).parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos-as-long: truncate to micros
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # timestamp_ntz (or timestamp): wall clock interpreted in the UTC
        # session zone — bit-identical to DuckDB's naive read of the file
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = CORPUS_TABLES) -> dict[str, DataFrame]:
    """Dict-of-tables, the engine analogue of extract_dataframes()
    (reference src/etl/etl.py:11-18) — but lazy: nothing is read here."""
    return {name: table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = CORPUS_TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
