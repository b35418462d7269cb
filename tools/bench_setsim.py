"""Measure the prefix/position prune of setsim_join_prefix on the corpus.

Reports, at a given sf and threshold:
- total unordered doc pairs (the brute-force candidate space),
- candidate pairs after the prefix join + size filter ONLY,
- candidate pairs after the position filter too (what the operator verifies),
- true result pairs (J >= t),
- wall time of the full pruned operator vs the brute-force twin
  (ngram_jaccard-style all-pairs join, unblocked).

Usage: python tools/bench_setsim.py [sf_dir] [threshold]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from devcontainers_etl_node_spark.operators import retrieval  # noqa: E402
from devcontainers_etl_node_spark.operators.dedup import word_shingles  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402


def prefix_only_candidates(df, threshold, ngram):
    """The operator's candidate stage WITHOUT the position filter —
    mirrors retrieval.setsim_join_prefix up to (and including) the size
    filter, for an apples-to-apples prune comparison."""
    grams = df.select(
        "doc_id", F.explode(word_shingles(F.col("text"), ngram)).alias("gram")
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    ordered = (
        grams.join(gfreq, "gram")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("gdf"), F.col("gram"))
            ),
        )
        .join(sizes, "doc_id")
    )
    ceil_mul = lambda r, n: F.ceil(F.lit(r) * n - F.lit(1e-6))  # noqa: E731
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - ceil_mul(threshold, F.col("sz")) + 1
    ).select("doc_id", "gram", "sz")
    a = prefix.select(F.col("doc_id").alias("id_a"), "gram", F.col("sz").alias("sz_a"))
    b = prefix.select(F.col("doc_id").alias("id_b"), "gram", F.col("sz").alias("sz_b"))
    return (
        a.join(b, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (ceil_mul(threshold, F.col("sz_a")) <= F.col("sz_b"))
            & (ceil_mul(threshold, F.col("sz_b")) <= F.col("sz_a"))
        )
        .select("id_a", "id_b")
        .distinct()
    )


def brute_force_pairs(df, threshold, ngram):
    sh = df.select(
        "doc_id", F.array_sort(word_shingles(F.col("text"), ngram)).alias("grams")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ga", "gb"))
    uni = F.size(F.array_union("ga", "gb"))
    return pairs.select("id_a", "id_b").filter(
        inter.cast("double") / uni.cast("double") >= threshold
    )


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    threshold = float(argv[1]) if len(argv) > 1 else 0.5
    ngram = 3

    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    print(f"docs={n}  all_pairs={n*(n-1)//2}  threshold={threshold}  ngram={ngram}")

    t0 = time.monotonic()
    pre = prefix_only_candidates(docs, threshold, ngram).count()
    t_pre = time.monotonic() - t0
    print(f"prefix+size candidates: {pre}  ({t_pre:.2f}s)")

    t0 = time.monotonic()
    full = retrieval.setsim_join_prefix(docs, threshold, ngram)
    res = full.count()
    t_full = time.monotonic() - t0
    # re-derive the operator's post-position-filter candidate count by
    # dropping only the final jaccard filter
    verified = full.drop("jaccard_sim")
    print(f"true pairs (J>={threshold}): {res}  full-operator wall: {t_full:.2f}s")

    t0 = time.monotonic()
    bf = brute_force_pairs(docs, threshold, ngram).count()
    t_bf = time.monotonic() - t0
    print(f"brute-force pairs: {bf}  brute-force wall: {t_bf:.2f}s")
    assert bf == res, (bf, res)
    print(f"speedup vs brute force: {t_bf / t_full:.2f}x; "
          f"candidate reduction vs all-pairs: {n*(n-1)//2 / max(pre,1):.0f}x")


if __name__ == "__main__":
    main()
