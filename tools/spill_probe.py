"""Spill-not-OOM probe: run a heavy dedup shuffle under a memory-starved
session and report the spill metrics.

Workloads (argv[1], default "band"):

- ``band``   — the MinHash band self-join (sort-merge over 4 M banded
  rows/side against a ~35 MB/task budget; unique signatures, so it
  measures SORT pressure, not a pair blowup).
- ``substr`` — the ExactSubstr gram pipeline (`substr_clean_batch` on an
  empty history): ~12 M (g, doc_id, p) gram rows — 8-byte hashes at
  every token position, the heaviest shuffle family in the repo — through
  gram-count groupBy, dup-gram join-back, covered-position DISTINCT and
  the token anti-join, all far past the execution budget. 10 % of docs
  share a planted 16-token span so the dup/covered path does real work.

The 100 TB story for the dedup family says "disk-backed so it spills,
never OOMs" (operators/dedup.py). That claim is only real if a shuffle
that exceeds execution memory actually completes by spilling — so this
probe builds a signature table whose banded sort-merge join must sort
far more per task than the session's execution memory allows, runs it,
and reads the per-stage memory/disk spill totals back through the UI
REST API. It runs in its OWN process because driver memory and
spark.memory.fraction are JVM-start settings — the test session's 48 g
heap cannot be shrunk after the fact.

Session: 1 g driver heap, memory.fraction 0.2 (~140 MB execution memory
shared by 4 local cores => ~35 MB per task), broadcast joins disabled so
the band join is a real sort-merge over the shuffle.

Data: 1 M synthetic signatures x 16 longs. Banded (4 bands) that is
~4 M rows per join side sorted in 4 partitions — hundreds of MB of sort
data per task against a ~35 MB budget. Signatures are unique per id
(xxhash64 of the id), so the join output is tiny: the probe measures
SORT pressure, not a pathological pair blowup.

Prints ONE JSON line:
  {"rows": N, "memory_spilled_bytes": X, "disk_spilled_bytes": Y,
   "peak_execution_memory": Z}
Exit 0 iff the join completed. The caller asserts spill > 0.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("spill-probe")
        .config("spark.driver.memory", "1g")
        .config("spark.memory.fraction", "0.2")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")  # pick a free port; read uiWebUrl back
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from devcontainers_etl_node_spark.operators import dedup

    workload = sys.argv[1] if len(sys.argv) > 1 else "band"
    extra: dict = {}
    if workload == "band":
        num_hashes, bands = 16, 4
        sig = spark.range(1_000_000).select(
            F.col("id").alias("_id"),
            F.array(*[F.xxhash64(F.col("id"), F.lit(i)) for i in range(num_hashes)]).alias("_sig"),
        )
        pairs = dedup.band_candidate_pairs(sig, num_hashes=num_hashes, bands=bands)
        n = pairs.count()  # completes by SPILLING, or dies with OOM (exit != 0)
    elif workload == "substr":
        n_docs, n_toks = 200_000, 64
        span = " ".join(f"planted{j}" for j in range(16))
        body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(n_toks)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(1_000_000))
                ),
            ),
            " ",
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, F.concat(F.lit(span + " "), body))
            .otherwise(body)
            .alias("text"),
        )
        history = spark.createDataFrame([], "g LONG, nd LONG")
        clean, _merged, _bc = dedup.substr_clean_batch(history, docs, k=8)
        n = clean.count()  # completes by SPILLING, or dies with OOM
    elif workload == "prefixsum":
        from devcontainers_etl_node_spark.operators import prefixsum

        # 16 M rows into 64 buckets hashed over 4 shuffle partitions →
        # each task window-sorts ~4 M rows (~100 MB) against the ~35 MB
        # budget.  v = 1 makes the result self-checking: the total order
        # is unique, so cum takes each value 1..n exactly once and
        # SUM(cum) must equal n(n+1)/2 — correctness verified THROUGH
        # the spill, not just completion.
        n_rows = 16_000_000
        df = spark.range(n_rows).select(
            F.col("id").alias("rid"),
            F.pmod(F.xxhash64("id"), F.lit(2**32)).alias("h"),
            F.lit(1).alias("v"),
        )
        out = prefixsum.global_running_sum(df, "h", ["rid"], "v")
        total = out.agg(F.sum("cum").alias("t")).collect()[0].t
        n = n_rows if total == n_rows * (n_rows + 1) // 2 else -1
    elif workload == "prefixsum_ranged":
        from devcontainers_etl_node_spark.operators import prefixsum

        # the SKEWED natural-ordering case the ranged variant exists for,
        # pushed to its documented worst case: 10 M rows where HALF the
        # mass sits on one day (ties cannot split across range buckets,
        # so one bucket window-sorts ~5.5 M rows — far past the ~35 MB
        # task budget).  (day, rid) is a total order, v = 1, so SUM(cum)
        # == n(n+1)/2 verifies exactness THROUGH the spill.  Also reports
        # the realized per-bucket row distribution.
        n_rows = 10_000_000
        df = spark.range(n_rows).select(
            F.col("id").alias("rid"),
            F.when(F.col("id") % 2 == 0, F.lit(100).cast("long"))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
            .alias("day"),
            F.lit(1).alias("v"),
        )
        out_df = prefixsum.global_running_sum_ranged(df, "day", ["rid"], "v")
        total = out_df.agg(F.sum("cum").alias("t")).collect()[0].t
        n = n_rows if total == n_rows * (n_rows + 1) // 2 else -1
        # realized bucket sizes (same GK boundaries → same buckets)
        qs = [i / 64 for i in range(1, 64)]
        bounds = sorted(set(df.stat.approxQuantile("day", qs, 0.001)))
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + F.when(F.col("day") > F.lit(b), 1).otherwise(0)
        sizes = [
            r.c
            for r in df.groupBy(bucket.alias("bk")).agg(F.count(F.lit(1)).alias("c")).collect()
        ]
        extra = {"n_buckets_realized": len(sizes), "max_bucket_rows": max(sizes)}
    elif workload == "setsim":
        from devcontainers_etl_node_spark.operators import retrieval

        # the exact similarity self-join under memory pressure: 160 k
        # docs x 40 tokens from a 100 k vocab => ~6 M positional gram
        # rows through the size/freq groupBys, the per-doc position
        # window, the prefix self-join and the verify join — each stage
        # sorts ~1.5 M wide-ish rows per task against the ~35 MB budget.
        # Every doc with id % 40 == 1 clones doc id-1's text => exactly
        # n/40 planted J=1.0 pairs; with a 100 k vocab the chance any
        # UNRELATED pair reaches J >= 0.9 is negligible, so the result
        # set is self-checking THROUGH the spill.
        n_docs = 160_000
        base_id = F.when(F.col("id") % 40 == 1, F.col("id") - 1).otherwise(F.col("id"))
        body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(base_id, i), F.lit(100_000))
                ),
            ),
            " ",
        )
        docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), body.alias("text"))
        pairs = retrieval.setsim_join_prefix(docs, threshold=0.9, ngram=3)
        found = pairs.count()
        planted = len(range(1, n_docs, 40))
        n = n_docs if found == planted else -found
        extra = {"planted_pairs": planted, "found_pairs": found}
    else:
        raise SystemExit(f"unknown workload {workload!r}")

    ui = spark.sparkContext.uiWebUrl  # e.g. http://host:4041
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)

    out = {
        "rows": n,
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "peak_execution_memory": max(
            (s.get("peakExecutionMemory", 0) for s in stages), default=0
        ),
        **extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
