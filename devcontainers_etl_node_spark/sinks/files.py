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

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


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


def write_doc_store(
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Durable doc store laid out for CANDIDATE-PRUNED lookups: parquet
    hive-partitioned by ``bkt = pmod(xxhash64(id), n_buckets)``, rows
    sorted by id within each bucket (parquet min/max row-group skipping
    on the id), plus a ``_STORE_MANIFEST.json`` pinning the layout so
    readers derive the SAME bucket for an id.

    This is the store :func:`..streaming.pipeline.minhash_slim_verify_sink`
    reads: a micro-batch's candidate ids select ≤ n_buckets partition
    directories at LISTING time, so verify-scan bytes track the
    candidates' buckets, never the store size (measured in PERF.md r13).
    At 100 TB size ``n_buckets`` so a bucket is a few hundred MB — the
    prune is by directory, so finer buckets = finer prune.

    Bucket derivation is TYPE-sensitive (r13 advice fix):
    ``xxhash64(int)`` ≠ ``xxhash64(long)`` for the same value, and the
    verify sink hashes candidate ids forced to LONG by the streaming
    output schema — so integral ids are cast to long HERE (making the
    writer's buckets match the sink's derivation for byte/short/int/long
    corpora alike), and the id type lands in the manifest so a reader
    whose key type cannot match fails loudly instead of silently pruning
    to the wrong buckets and emitting zero pairs.
    """
    import json
    import os

    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    integral = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    key = F.col(id_col).cast("long") if integral else F.col(id_col)
    layout = {
        "n_buckets": n_buckets,
        "id_col": id_col,
        "text_col": text_col,
        "id_type": "long" if integral else id_type.simpleString(),
    }
    mpath = os.path.join(root, "_STORE_MANIFEST.json")
    if mode == "append" and os.path.exists(mpath):
        # the bucket expression is part of the LAYOUT: appending under a
        # different n_buckets would place new rows where readers derive
        # the OLD buckets for old ids (and vice versa) — candidate pairs
        # would silently vanish from the pruned verify scan. Fail loudly.
        with open(mpath) as f:
            committed = json.load(f)
        if "id_type" not in committed:
            # pre-r14 manifests predate id_type, and the ORIGINAL id type
            # is unknowable from the manifest: assuming "long" would let
            # an int-keyed store (whose rows sit in xxhash64(int) buckets)
            # accept correctly-bucketed new rows AND get re-stamped
            # id_type=long — a mixed-derivation store that looks sound.
            # Refuse; a rebuild re-buckets every row under one rule.
            raise ValueError(
                f"doc store at {root} predates the id_type layout manifest "
                f"(pre-r14): its bucket derivation cannot be verified, so "
                f"appending could mix two bucket rules in one store — "
                f"rewrite it with mode='overwrite' to re-bucket under the "
                f"current layout"
            )
        if committed != layout:
            raise ValueError(
                f"doc store at {root} was written with {committed}; append "
                f"must use the same layout (got {layout}) — or rewrite the "
                f"store with mode='overwrite'"
            )
    keyed = docs.select(
        key.alias("_sid"),
        F.col(text_col).alias("_stext"),
        F.pmod(F.xxhash64(key), F.lit(n_buckets)).alias("bkt"),
    )
    (
        keyed.repartition("bkt")
        .sortWithinPartitions("_sid")
        .write.mode(mode)
        .partitionBy("bkt")
        .parquet(root)
    )
    with open(mpath, "w") as f:
        json.dump(layout, f)


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


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leave every other partition untouched.

    This is the scale-correct incremental write: a daily batch touching 1
    of 3000 date partitions rewrites 1/3000th of the table, while plain
    ``mode("overwrite")`` would truncate ALL of it. The per-write option
    is used (not the session config) so one writer's choice can't leak
    into unrelated writes on the shared session.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite a parquet table into ~``target_file_bytes`` files.

    The small-files problem is the classic long-running-ingest failure
    mode: streaming/incremental writers leave thousands of KB-sized files
    per partition, and at 100 TB the scan becomes metadata-bound (one
    task + one open per file). This measures on-disk bytes via the Hadoop
    FileSystem, computes the output file count, and rewrites through a
    staging directory with an atomic-as-the-FS-allows swap (write staged
    → delete original → rename) so a crash never leaves a half-compacted
    table in place of the original — the staging dir survives for manual
    recovery instead.

    Partitioned tables pass ``partition_cols``: rows are shuffled by
    partition key so each output partition dir gets coherent files.
    Returns {files_before, files_after, bytes}.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(hconf)

    def _stats(p) -> tuple[int, int]:
        total, nfiles = 0, 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if not name.startswith("_") and not name.startswith("."):
                total += f.getLen()
                nfiles += 1
        return total, nfiles

    total_bytes, files_before = _stats(src)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)

    staging = path.rstrip("/") + ".__compact_staging__"
    staging_p = jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(staging_p):  # leftover from a previous crash
        fs.delete(staging_p, True)
    if partition_cols:
        out = df.repartition(n_out, *[F.col(c) for c in partition_cols])
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)

    fs.delete(src, True)
    if not fs.rename(staging_p, src):
        raise IOError(f"compact_small_files: rename {staging} -> {path} failed")
    _, files_after = _stats(src)
    return {"files_before": files_before, "files_after": files_after, "bytes": total_bytes}


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton (Z-order) key over equi-width bucket ids of the given
    numeric columns — the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER BY. Each column is bucketed into
    2^bits equi-width bins between per-column min/max (window-free: the
    caller supplies columns already normalized, or uses write_zordered
    which computes bounds in one tiny pre-pass), then the bucket bits
    are interleaved so records close in EVERY dimension land close in
    the sort order. Pure shift/mask expressions — codegen'd, no UDF.

    Expects each column pre-scaled to [0, 1); values are clamped.
    """
    key = F.lit(0).cast("long")
    nbuckets = 1 << bits
    for lane, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        b = F.least(
            F.greatest((cc * nbuckets).cast("long"), F.lit(0)), F.lit(nbuckets - 1)
        )
        for j in range(bits):
            key = key + (F.shiftleft(F.shiftright(b, j).bitwiseAND(1), j * len(cols) + lane))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered by the Z-order of `cols`: one tiny pre-pass
    computes per-column min/max (broadcast), each column is scaled to
    [0,1), and rows are range-partitioned + sorted by the interleaved
    key. Result: every output file covers a narrow range of EVERY
    z-column, so parquet min/max row-group stats prune scans filtered on
    any of them — single-column sorting only prunes its own column. At
    100 TB this is the difference between reading 1/256th and reading
    everything for a selective filter on the second dimension."""
    bounds = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    scaled = [
        (
            (F.col(c) - F.col(f"__mn_{c}"))
            / F.when(
                F.col(f"__mx_{c}") != F.col(f"__mn_{c}"),
                F.col(f"__mx_{c}") - F.col(f"__mn_{c}"),
            ).otherwise(F.lit(1.0))
        )
        for c in cols
    ]
    (
        df.join(F.broadcast(bounds))
        .withColumn("__zkey", zorder_key(scaled, bits=bits))
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )
