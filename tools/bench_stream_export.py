"""Per-batch open-format export overhead on a long streaming run
(r10 verdict task 7): drive the exact work ``txlog_sink(export=...)``
does per micro-batch — one idempotent txlog commit, then the Delta and
Iceberg incremental exports — for N batches, and record the export cost
per batch as the table's history grows.

The claim under test (r11 incremental exporters): per-batch export work
is O(batch files), NOT O(history) — the ms/batch curve must be FLAT in
batch number.  Before r11 both exporters rebuilt the whole tree every
call, which made this curve linear (the r10 advice finding).

Usage:
    python tools/bench_stream_export.py [n_batches] [rows_per_batch]
    # defaults: 1000 batches x 100 rows

Prints a window table (mean/min/max ms per 100-batch window, for each
format) plus a least-squares slope in microseconds per batch — paste
into PERF.md.  The deterministic counterpart (exports append exactly one
commit per batch, no rebuilds) is pinned in
tests/test_delta_export.py / test_iceberg_export.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.sinks.delta_export import tx_export_delta
    from devcontainers_etl_node_spark.sinks.iceberg_export import tx_export_iceberg

    spark = get_spark()
    root = os.path.join(tempfile.mkdtemp(prefix="stream-export-bench-"), "t")
    print(
        f"# stream export bench: {n_batches} batches x {rows} rows, "
        f"start loadavg={os.getloadavg()[0]:.2f}"
    )
    delta_ms: list[float] = []
    ice_ms: list[float] = []
    commit_ms: list[float] = []
    try:
        for b in range(n_batches):
            df = spark.range(b * rows, (b + 1) * rows).select(
                F.col("id"), F.lit(f"b{b}").alias("batch")
            ).coalesce(1)
            t0 = time.perf_counter()
            txlog.tx_write_idempotent(df, root, "bench-app", b)
            t1 = time.perf_counter()
            tx_export_delta(root)
            t2 = time.perf_counter()
            tx_export_iceberg(root)
            t3 = time.perf_counter()
            commit_ms.append((t1 - t0) * 1000)
            delta_ms.append((t2 - t1) * 1000)
            ice_ms.append((t3 - t2) * 1000)
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)

    win = 100
    print("| batches | txlog commit ms | delta export ms | iceberg export ms |")
    print("|---|---|---|---|")
    for i in range(0, n_batches, win):
        c = commit_ms[i : i + win]
        d = delta_ms[i : i + win]
        g = ice_ms[i : i + win]
        print(
            f"| {i}-{i + len(c) - 1} "
            f"| {sum(c)/len(c):.1f} (min {min(c):.1f}) "
            f"| {sum(d)/len(d):.2f} (min {min(d):.2f}) "
            f"| {sum(g)/len(g):.2f} (min {min(g):.2f}) |"
        )

    def slope_us_per_batch(ys: list[float]) -> float:
        n = len(ys)
        xbar = (n - 1) / 2
        ybar = sum(ys) / n
        num = sum((i - xbar) * (y - ybar) for i, y in enumerate(ys))
        den = sum((i - xbar) ** 2 for i in range(n))
        return num / den * 1000  # ms/batch -> us/batch

    print(
        f"slope: delta {slope_us_per_batch(delta_ms):+.2f} us/batch, "
        f"iceberg {slope_us_per_batch(ice_ms):+.2f} us/batch, "
        f"commit {slope_us_per_batch(commit_ms):+.2f} us/batch "
        f"(flat = |slope| well under the per-batch mean/1000)"
    )
    print(
        f"end loadavg={os.getloadavg()[0]:.2f}; "
        f"totals: delta {sum(delta_ms)/1000:.1f} s, iceberg {sum(ice_ms)/1000:.1f} s "
        f"over {n_batches} batches"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
