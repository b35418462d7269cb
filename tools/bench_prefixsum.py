"""Prefix-sum scaling: global_running_sum vs the naive unpartitioned
window at increasing row counts, so "no single-reducer sort at 100 TB"
is a measured curve, not an assertion.

Input: n rows with a uniform 32-bit hash order key (the deterministic
epoch-shuffle shape token_shard_pack uses) and a small integer value.
Both sides compute the identical inclusive running sum (asserted equal
at the smallest size); the naive side is Spark's own
``SUM(v) OVER (ORDER BY h, rid)`` — one partition holds every row.

Expectation: the distributed side's cost is two parallel passes + one
bounded collect and stays ~flat per-row as n grows; the naive side
serializes the sort+scan on one task and its wall-clock grows with n on
any cluster no matter how wide.  Paste the table into PERF.md when it
changes.

Usage: python tools/bench_prefixsum.py [sizes_csv]  (default 1000000,4000000,16000000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from devcontainers_etl_node_spark.operators import prefixsum  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402


def data(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id"), F.lit(2**32)).alias("h"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(500)).alias("v"),
    )


def main() -> None:
    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1000000,4000000,16000000").split(",")]
    spark = get_spark()
    # checksum forces full evaluation without moving rows to the driver
    agg = lambda df: df.agg(F.sum(F.col("cum")).alias("s")).collect()[0].s  # noqa: E731

    df0 = data(spark, 100_000).localCheckpoint(eager=True)
    w = Window.orderBy("h", "rid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive0 = df0.select(F.sum("v").over(w).alias("cum"))
    dist0 = prefixsum.global_running_sum(df0, "h", ["rid"], "v")
    assert agg(naive0) == agg(dist0), "distributed prefix sum != naive window"
    print("parity OK at 100k rows")

    print(f"{'rows':>12} {'dist_s':>8} {'naive_s':>8} {'ratio':>6}")
    for n in sizes:
        df = data(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        agg(prefixsum.global_running_sum(df, "h", ["rid"], "v"))
        t_dist = time.time() - t0
        t0 = time.time()
        agg(df.select(F.sum("v").over(w).alias("cum")))
        t_naive = time.time() - t0
        print(f"{n:>12} {t_dist:>8.2f} {t_naive:>8.2f} {t_naive / t_dist:>6.2f}")
        df.unpersist()


if __name__ == "__main__":
    main()
