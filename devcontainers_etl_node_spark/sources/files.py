"""File sources: the reference's S3/MinIO CSV snapshot reader, Spark-first.

Reference behavior being re-expressed (SURVEY §2.1 S3/S4, §2.4 F4/F5):
- list objects under a prefix, keep ``*.csv`` (``extractors.py:87-101``) →
  one multi-path scan with ``pathGlobFilter``; Hadoop S3A (or the local FS)
  does listing/pagination, so the engine never materializes a key list.
- per-file provenance column ``object`` = object key (``extractors.py:115``)
  → ``input_file_name()``.
- lenient ``date`` parse, errors → null (``extractors.py:110-111``) →
  ``try_to_timestamp``-based cast.
- date inferred from the filename when the column is missing/null
  (``_infer_date_from_key``, ``extractors.py:75-85``) → regexp over
  ``input_file_name()``; ``/`` and ``_`` both accepted as separators.
- empty prefix → typed empty DataFrame (``extractors.py:117-118``) — with a
  declared schema Spark returns exactly that for zero matching files.
- stable sort by date (``extractors.py:120-121``) is intentionally NOT done
  here: global pre-sorts are wasted work at scale; order belongs to the
  final query (SURVEY §7 risk list).

At 100 TB: one scan, splittable by file; filters/pruning push into the
listing via partition directories (see sinks/files.py for the writer that
lays out the Y/M tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from devcontainers_etl_node_spark.schemas import INVENTORY_CSV

# (\d{4})[-_/](\d{2})[-_/](\d{2}) over the key with / kept — the reference
# first replaces "/" with "-" (extractors.py:79); accepting all three
# separators in one regex is equivalent.
_DATE_RE = r"(\d{4})[-_/](\d{2})[-_/](\d{2})"


def infer_date_from_filename(col: F.Column) -> F.Column:
    """Date from a YYYY?MM?DD group in the path; null if absent/invalid."""
    y = F.regexp_extract(col, _DATE_RE, 1)
    m = F.regexp_extract(col, _DATE_RE, 2)
    d = F.regexp_extract(col, _DATE_RE, 3)
    iso = F.concat_ws("-", y, m, d)
    return F.when(y == "", F.lit(None).cast("date")).otherwise(F.try_to_timestamp(iso).cast("date"))


def read_inventory_csv_tree(
    spark: SparkSession,
    root: str,
    glob: str = "*.csv",
) -> DataFrame:
    """Inventory snapshots from a CSV prefix tree with provenance + date
    inference — the engine's S4 (+F4/F5/P6/U1 union-by-scan).

    Works on any Hadoop-compatible FS (local path in tests, ``s3a://`` in
    production — same code path).
    """
    raw = (
        spark.read.schema(INVENTORY_CSV)
        .option("header", True)
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .csv(root)
        .withColumn("object", F.input_file_name())
    )
    return raw.select(
        # column date if parseable, else filename date (extractors.py:110-114)
        F.coalesce(
            F.try_to_timestamp(F.col("date")).cast("date"),
            infer_date_from_filename(F.col("object")),
        ).alias("date"),
        F.coalesce(F.col("product_id").try_cast("bigint"), F.lit(0)).alias("product_id"),
        F.col("warehouse_id"),
        F.coalesce(F.col("stock_units").try_cast("int"), F.lit(0)).alias("stock_units"),
        F.col("object"),
    )


def read_binary_tree(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw media ingest: read a directory tree of opaque blobs (images,
    audio, video segments) as one row per file via Spark's built-in
    ``binaryFile`` source — (path, modificationTime, length, content).
    This is how multimodal payloads LAND in the engine before the
    operators in operators/multimodal.py (decode / resize / frame-sample)
    take over; the parquet `media` columns those operators consume are
    this scan's persisted form.

    Scale notes: the source is splittable BY FILE (one file = one task
    unit — fine for media corpora of many small-to-medium objects; a
    single 1 TB file would not parallelize, but media files never look
    like that). ``pathGlobFilter`` prunes at LISTING time — non-matching
    objects are never opened — and ``modifiedAfter``/``modifiedBefore``
    options compose for incremental loads. ``max_bytes`` guards executor
    memory against a rogue giant object: content is NULLed (metadata
    kept) rather than the row dropped, so the audit trail survives.
    Works on any Hadoop-compatible FS (local in tests, ``s3a://`` in
    production — same code path).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(root)
    )
    if max_bytes is not None:
        raw = raw.withColumn(
            "content",
            F.when(F.col("length") <= max_bytes, F.col("content")),
        )
    return raw.select(
        F.col("path").alias("object"),
        F.col("modificationTime").alias("modified_at"),
        F.col("length").cast("long").alias("n_bytes"),
        "content",
    )
