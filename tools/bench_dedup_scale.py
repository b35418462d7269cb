"""Dedup operator scaling curves on synthetic corpora.

Measures exact_dedup, minhash_lsh_pairs, and both ngram_jaccard_pairs
paths (inverted-index default vs AllPairs prefix filter) at increasing
corpus sizes, so "would this hold at 1000x?" is a measured curve, not an
assertion. The corpus mixes:

- 90% unique docs drawing 40 words from a SHARED 5000-word vocabulary
  (word_j = w{xxhash64(id, j) % 5000}) — the token space overlaps like
  real text, but whole 3-grams collide across docs only by chance (a
  first-draft linear mixing `(id*7 + j*13) % 5000` made ids 5000 apart
  IDENTICAL documents, so pair output grew quadratically with corpus
  size and the benchmark measured output volume, not algorithm cost);
- 10% near-duplicate docs in 4-member families (shared per-family
  30-word boilerplate + a unique 10-word tail), so true-pair output is
  bounded (6 pairs/family) instead of quadratic in corpus size.

All sides produce identical pair sets (asserted per size for the two
ngram paths). Paste the table into PERF.md when it changes.

Usage: python tools/bench_dedup_scale.py [sizes_csv]   (default 5000,20000,80000)
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


def corpus(spark, n: int):
    n_dup = n // 10
    fam_words = F.concat_ws(
        " ", *[F.concat(F.lit(f"f{j}x"), (F.col("id") / 4).cast("long").cast("string")) for j in range(30)]
    )
    tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"t{j}x"), F.col("id").cast("string")) for j in range(10)]
    )
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(j)), F.lit(5000)).cast("string"))
            for j in range(40)
        ],
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_dup, F.concat_ws(" ", fam_words, tail)).otherwise(uniq).alias("text"),
    )


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [5000, 20000, 80000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| docs | exact_dedup | minhash 32/8 | ngram inverted | ngram prefix | true pairs |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        docs = corpus(spark, n).localCheckpoint(eager=True)
        row: dict[str, float] = {}
        pair_counts: dict[str, int] = {}
        runs = {
            "exact": lambda: dedup.exact_dedup(docs).count(),
            "minhash": lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5).count(),
            "inv": lambda: dedup.ngram_jaccard_pairs(docs, ngram=3, threshold=0.2).count(),
            "pfx": lambda: dedup.ngram_jaccard_pairs(
                docs, ngram=3, threshold=0.2, prefix_filter=True
            ).count(),
        }
        for label, run in runs.items():
            best = float("inf")
            for _ in range(2):
                gc.collect()
                t0 = time.perf_counter()
                cnt = run()
                best = min(best, time.perf_counter() - t0)
            row[label] = best
            pair_counts[label] = cnt
        assert pair_counts["inv"] == pair_counts["pfx"], (
            f"pair-set size diverged at n={n}: {pair_counts}"
        )
        print(
            f"| {n:,} | {row['exact']:.2f}s | {row['minhash']:.2f}s "
            f"| {row['inv']:.2f}s | {row['pfx']:.2f}s | {pair_counts['inv']:,} |"
        )


if __name__ == "__main__":
    main()
