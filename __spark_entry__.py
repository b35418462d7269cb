"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's star-join enrichment,
  src/etl/etl.py:20-54, re-expressed as AQE-planned dimension joins —
  broadcast while the dim fits, shuffle at scale) on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 —
  see devcontainers_etl_node_spark/queries/catalog.py.
- ``oracle_sql()``: the DuckDB-equivalent SQL per query (omitted for
  approximate / non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from devcontainers_etl_node_spark.queries.catalog import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["star_enrich"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (subset: approximate ops are
    deliberately omitted → driver records the weaker rows-only check)."""
    return dict(ORACLE)
