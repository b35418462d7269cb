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
