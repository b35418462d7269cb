"""Measure AQE skew-join handling on a boilerplate-skewed MinHash corpus.

PERF.md claims the band bucket self-join survives boilerplate-heavy
shards because AQE splits the oversized bucket partition. This measures
that claim instead of asserting it: a synthetic corpus where 20% of the
docs share one boilerplate block (so their signatures collide in every
band — one giant (band, bh) bucket) is run through the full
minhash_lsh_pairs operator with spark.sql.adaptive.skewJoin.enabled
true vs false, and through the band join alone.

Broadcast joins are disabled for the measurement: at corpus scale the
banded table is TBs (far beyond any broadcast threshold), but at test
scale AQE would broadcast it and the skew path would never execute.
Skew thresholds are lowered for the same reason (test-scale partitions
are KBs, production thresholds are 256 MB).

Usage: python tools/bench_skew_minhash.py [n_docs] [hot_fraction]
Prints a small table; paste the numbers into PERF.md when they change.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from devcontainers_etl_node_spark.operators import dedup  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402

BOILERPLATE = (
    "terms of service privacy policy cookie notice all rights reserved "
    "subscribe to our newsletter follow us on social media contact support "
    "copyright two thousand twenty four navigation home products pricing "
    "documentation about careers blog press kit status page sitemap help "
)


def skewed_corpus(spark, n_docs: int, hot_fraction: float):
    """20% of docs = identical boilerplate + tiny unique tail (signatures
    collide in every band); the rest are unique word soup."""
    n_hot = int(n_docs * hot_fraction)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.concat(F.lit(BOILERPLATE), F.lit("ticket "), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}-"), F.conv((F.col("id") * (j + 13)).cast("string"), 10, 36))
                    for j in range(40)
                ],
            )
        )
        .alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    hot_fraction = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    }
    for k, v in confs.items():
        spark.conf.set(k, v)

    docs = skewed_corpus(spark, n_docs, hot_fraction).localCheckpoint(eager=True)

    # --- band join alone, on a signature table shaped like the corpus ----
    n_hot = int(n_docs * hot_fraction)
    sig = spark.range(n_docs).select(
        F.col("id").alias("_id"),
        F.when(F.col("id") < n_hot, F.array(*[F.lit(i).cast("long") for i in range(16)]))
        .otherwise(F.array(*[F.xxhash64(F.col("id"), F.lit(i)) for i in range(16)]))
        .alias("_sig"),
    ).localCheckpoint(eager=True)

    results: dict[str, dict[str, float]] = {}
    for enabled in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
        row: dict[str, float] = {}
        for label, run in (
            ("band_join", lambda: dedup.band_candidate_pairs(sig, 16, 4)
                ._jdf.queryExecution().executedPlan().execute().count()),
            ("full_minhash", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5).count()),
        ):
            best = float("inf")
            for _ in range(2):
                gc.collect()
                t0 = time.perf_counter()
                n = run()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
            row[f"{label}_rows"] = n
        results[enabled] = row

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert results["true"]["band_join_rows"] == results["false"]["band_join_rows"]
    assert results["true"]["full_minhash_rows"] == results["false"]["full_minhash_rows"]

    print(f"\nn_docs={n_docs} hot_fraction={hot_fraction} "
          f"(hot bucket = {n_hot} docs -> {n_hot*(n_hot-1)//2} pairs)")
    print(f"{'stage':<14} {'skew on':>9} {'skew off':>9} {'speedup':>8}")
    for stage in ("band_join", "full_minhash"):
        on, off = results["true"][stage], results["false"][stage]
        print(f"{stage:<14} {on:>8}s {off:>8}s {off/on:>7.2f}x")


if __name__ == "__main__":
    main()
