"""Measure tx_merge's pruned copy-on-write rewrite vs table size.

Builds id-clustered txlog tables of increasing size (fixed ~rows/file via
repartitionByRange), merges the SAME 10-key update batch into each, and
reports wall time, files rewritten, and files carried over. The claim
under test: merge cost tracks the TOUCHED-file volume, not the table —
on a clustered table a 10-key merge rewrites O(1) files at any size.

Usage: python tools/bench_txmerge.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from devcontainers_etl_node_spark.session import get_spark  # noqa: E402
from devcontainers_etl_node_spark.sinks import txlog  # noqa: E402

ROWS_PER_FILE = 250_000
UPDATE_KEYS = list(range(500, 510))  # all land in the table's first file


def main() -> None:
    spark = get_spark()
    for n_rows in (1_000_000, 4_000_000, 16_000_000):
        root = tempfile.mkdtemp(prefix=f"txmerge_{n_rows}_")
        n_files = n_rows // ROWS_PER_FILE
        base = (
            spark.range(n_rows)
            .select(F.col("id"), (F.col("id") % 97).cast("long").alias("payload"))
            .repartitionByRange(n_files, "id")
        )
        txlog.tx_write(base, root)
        before = txlog._read_manifest(root, 0)["files"]

        updates = spark.createDataFrame(
            [(k, -1) for k in UPDATE_KEYS], "id LONG, payload LONG"
        )
        t0 = time.monotonic()
        txlog.tx_merge(spark, updates, root, key="id")
        wall = time.monotonic() - t0
        m = txlog._read_manifest(root, 1)
        carried = len([e for e in m["files"] if e["path"] not in set(m["added"])])
        n = txlog.tx_read(spark, root).count()
        assert n == n_rows, (n, n_rows)
        print(
            f"rows={n_rows:>9,}  files={len(before):>3}  rewritten={len(m['removed'])}  "
            f"carried={carried:>3}  merge_wall={wall:5.2f}s"
        )
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
