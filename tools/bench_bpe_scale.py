"""BPE training scaling curve: corpus-pass cost vs merge-loop cost.

The 100 TB claim for `bpe_train_merges` (PERF.md ledger) is that the
corpus is touched ONCE (the word-frequency aggregation) and every merge
iteration after that is VOCABULARY-sized. This tool measures it instead
of asserting it: synthetic corpora of growing document count draw words
from a FIXED vocabulary (capped distinct words), so if the claim holds,
the word-count pass grows with the corpus while the 8-merge loop stays
flat.

Corpus: each doc is 40 words `w{xxhash64(id, j) % V}` (V = 20 000), the
same hash-mixed shape as bench_dedup_scale (linear mixing makes
accidental duplicate docs; hash mixing keeps the token space overlapping
like real text without degenerate structure).

Second table — jobs vs merges (the batched-trainer claim): the
sequential trainer runs ~2 Spark jobs per MERGE (pair-count argmax +
merge apply); ``bpe_train_merges_batched`` runs ~2 jobs per ROUND of up
to ``batch_size`` symbol-disjoint merges, so a 64-merge vocabulary
costs ~8 rounds at batch_size=8 instead of 64 sequential iterations.
Measured here on the real sf0.01 documents table with Spark job counts
read from the status tracker, alongside wall time — the acceptance
criterion is 64 batched merges in < 10x the 8-merge sequential wall.

Usage: python tools/bench_bpe_scale.py [sizes_csv]  (default 10000,40000,160000)
Paste the tables into PERF.md when they change.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from devcontainers_etl_node_spark.operators import text as tx  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402

VOCAB = 20_000


def corpus(spark, n: int):
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(j)), F.lit(VOCAB)).cast("string"))
            for j in range(40)
        ],
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), words.alias("text"))


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [10_000, 40_000, 160_000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| docs | distinct words | wf pass (s) | 8-merge loop (s) | total (s) |")
    print("|---|---|---|---|---|")
    for n in sizes:
        docs = corpus(spark, n).localCheckpoint(eager=True)
        best_wf, best_total = float("inf"), float("inf")
        n_words = None
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n_words = tx.word_freq_table(docs).count()
            best_wf = min(best_wf, time.perf_counter() - t0)
            t0 = time.perf_counter()
            merges = tx.bpe_train_merges(docs, n_merges=8)
            assert len(merges) == 8
            best_total = min(best_total, time.perf_counter() - t0)
        print(
            f"| {n} | {n_words} | {best_wf:.2f} | {best_total - best_wf:.2f} | {best_total:.2f} |",
            flush=True,
        )
    jobs_vs_merges(spark)


def _job_count(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def jobs_vs_merges(spark) -> None:
    """Sequential vs batched trainer on the real sf0.01 corpus: wall
    time and Spark job count per configuration."""
    from devcontainers_etl_node_spark.catalog import table as corpus_table

    docs = corpus_table(spark, "/root/testdata/sf0.01", "documents").localCheckpoint(
        eager=True
    )
    configs = [
        ("sequential n=8", lambda: tx.bpe_train_merges(docs, n_merges=8)),
        (
            "batched n=8 bs=8",
            lambda: tx.bpe_train_merges_batched(docs, n_merges=8, batch_size=8),
        ),
        (
            "batched n=64 bs=8",
            lambda: tx.bpe_train_merges_batched(docs, n_merges=64, batch_size=8),
        ),
        ("sequential n=64", lambda: tx.bpe_train_merges(docs, n_merges=64)),
    ]
    print("\n| trainer | merges | spark jobs | wall (s) |")
    print("|---|---|---|---|")
    walls = {}
    for name, fn in configs:
        gc.collect()
        j0 = _job_count(spark)
        t0 = time.perf_counter()
        merges = fn()
        wall = time.perf_counter() - t0
        walls[name] = wall
        print(
            f"| {name} | {len(merges)} | {_job_count(spark) - j0} | {wall:.2f} |",
            flush=True,
        )
    ratio = walls["batched n=64 bs=8"] / walls["sequential n=8"]
    print(
        f"\nbatched-64 / sequential-8 wall ratio: {ratio:.2f}x "
        f"(acceptance: < 10x) -> {'PASS' if ratio < 10 else 'FAIL'}"
    )


if __name__ == "__main__":
    main()
