"""Fast declared-type audit of every oracled catalog entry.

Plan-time only: resolves each Spark query's schema (no job) and each
DuckDB oracle's relation types (no fetch), then reports every column
whose canonical type class differs (tools/type_parity.py).  The whole
audit runs in seconds, so it can gate every round — this is the check
whose absence let running_revenue_global's HUGEINT oracle ship in r8.

Usage: python tools/type_audit.py [sf_dir] [query ...]
Exit 1 on any unallowed mismatch.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from devcontainers_etl_node_spark.schemas import CORPUS_TABLES  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402
from tools.type_parity import type_mismatches  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    spark = get_spark()
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark schema: {e}")
            bad.append(name)
            continue
        try:
            rel = con.sql(oracles[name])
            dcols, dtypes = rel.columns, rel.types
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb plan: {e}")
            bad.append(name)
            continue
        mism = type_mismatches(schema, dcols, dtypes)
        if mism:
            print(f"TYPE  {name}: " + "; ".join(mism))
            bad.append(name)
    print(f"\n{len(bad)} entries with type drift" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
