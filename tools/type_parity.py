"""Declared-type parity between a Spark result schema and its DuckDB oracle.

Round-8 post-mortem: the driver's canonicalizer is TYPE-sensitive, while
our sweep's value hash stringifies cells — so a DuckDB oracle whose window
``SUM(BIGINT)`` silently widened to HUGEINT (int128) passed every local
sweep and then failed the driver's hash gate the day it rotated into the
subset (``running_revenue_global``, CORRECTNESS_r08.json).  This module
makes that class of defect impossible to ship: both ``tools/verify_oracle``
and ``tests/test_queries_oracle.py`` call :func:`type_mismatches` and fail
on any column whose canonical type class differs between engines.

Canonicalization intentionally collapses *safe* width differences (int32
vs int64 both arrive at the driver as exact integers with identical
repr) but keeps the classes that actually drift through a stringifying
or arrow-level canonicalizer apart:

- ``int128`` (DuckDB HUGEINT/UHUGEINT/UBIGINT) is its own class — never
  equal to ``int``.  Fix the oracle with ``CAST(... AS BIGINT)``.
- ``decimal`` vs ``float`` are distinct — Decimal('1.5') and 1.5 differ
  under both arrow schemas and repr().
"""

from __future__ import annotations

import re

# DuckDB declared type -> canonical class
_DUCK = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    # unsigned 64-bit and 128-bit ints do NOT fit Spark's long — own class
    "UBIGINT": "int128",
    "HUGEINT": "int128",
    "UHUGEINT": "int128",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "str",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BOOLEAN": "bool",
    "BLOB": "binary",
}

# Spark simpleString -> canonical class
_SPARK = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "double",
    "string": "str",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "boolean": "bool",
    "binary": "binary",
}

_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),\s*(\d+)\)$", re.IGNORECASE)


def canon_duck(t: str) -> str:
    s = str(t).strip().upper()
    m = _DECIMAL_RE.match(s)
    if m:
        # scale is part of the class: Decimal('1.50') vs Decimal('1.5')
        # stringify differently under the driver's canonicalizer
        return f"decimal(s={m.group(2)})"
    return _DUCK.get(s, s.lower())


def canon_spark(t: str) -> str:
    s = str(t).strip().lower()
    m = _DECIMAL_RE.match(s.upper())
    if m:
        return f"decimal(s={m.group(2)})"
    return _SPARK.get(s, s)


def type_mismatches(
    spark_schema,
    duck_cols: list[str],
    duck_types: list,
    allow: dict[str, tuple[str, str]] | None = None,
) -> list[str]:
    """Return human-readable mismatch strings ('' list when parity holds).

    ``allow`` maps column name -> (spark_class, duck_class) pairs that are
    intentionally accepted (each needs a comment at the call site saying
    why the driver tolerates it).
    """
    allow = allow or {}
    spark_by_name = {f.name: canon_spark(f.dataType.simpleString()) for f in spark_schema.fields}
    out = []
    for col, dt in zip(duck_cols, duck_types):
        if col not in spark_by_name:
            out.append(f"{col}: missing from spark schema")
            continue
        sc, dc = spark_by_name[col], canon_duck(dt)
        if sc == dc:
            continue
        if allow.get(col) == (sc, dc):
            continue
        out.append(f"{col}: spark={sc} duck={dc}")
    return out
