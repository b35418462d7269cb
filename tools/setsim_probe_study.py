"""Correlate the setsim pre-flight probe's predicted candidate volume
with the MEASURED prefix-filter volumes on independent corpus draws
(r10 verdict task 4 — "quantify the vocabulary-shaped constant").

For each draw (different seed and/or vocabulary size of
``gen_documents_zipf`` => different Zipf head): run
``retrieval.setsim_preflight`` (histogram-only, no candidate
generation), then measure ground truth by rebuilding the operator's own
prefix relation: raw prefix-bucket collisions ``Σ_g C(b_g, 2)``, the
post-size/position-filter candidate count, the verified pair count, and
the full-operator wall.  Columns to eyeball: predicted vs raw (the probe
models raw collisions), head_mass vs raw (the vocabulary-shaped
constant), and candidates/doc vs wall (the yield-to-minhash regime).

Usage:
    python tools/setsim_probe_study.py [n_docs]          # default 50000

Paste the table into PERF.md when it changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

DRAWS = [
    # (label, seed, vocab) — vocab moves the Zipf head: a smaller
    # vocabulary concentrates occurrences in fewer grams (heavier head)
    ("v30k/s42", 42, 30_000),
    ("v30k/s7", 7, 30_000),
    ("v10k/s99", 99, 10_000),
    ("v100k/s13", 13, 100_000),
]

THRESHOLD = 0.5
NGRAM = 3


def measure(spark, docs, threshold: float) -> dict:
    """Ground truth from the operator's own prefix relation."""
    from devcontainers_etl_node_spark.operators.retrieval import (
        _gram_rows,
        setsim_join_prefix,
    )

    grams = _gram_rows(docs, "text", "doc_id", NGRAM)
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
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-6)) + 1
    )
    raw = prefix.groupBy("gram").agg(F.count(F.lit(1)).alias("b")).agg(
        F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("raw")
    ).collect()[0]["raw"]

    # post-filter candidates: the operator's own candidate stage
    a = prefix.select(
        F.col("doc_id").alias("id_a"), "gram",
        F.col("pos").alias("pos_a"), F.col("sz").alias("sz_a"),
    )
    bb = prefix.select(
        F.col("doc_id").alias("id_b"), "gram",
        F.col("pos").alias("pos_b"), F.col("sz").alias("sz_b"),
    )
    alpha = F.ceil(
        F.lit(threshold / (1 + threshold)) * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-6)
    )
    ubound = F.least(F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")) + 1
    cand = (
        a.join(bb, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.ceil(F.lit(threshold) * F.col("sz_a") - F.lit(1e-6)) <= F.col("sz_b"))
            & (F.ceil(F.lit(threshold) * F.col("sz_b") - F.lit(1e-6)) <= F.col("sz_a"))
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.max(ubound).alias("ub"), F.max(alpha).alias("al"))
        .filter(F.col("ub") >= F.col("al"))
        .count()
    )
    t0 = time.perf_counter()
    pairs = setsim_join_prefix(docs, threshold=threshold, ngram=NGRAM).count()
    wall = round(time.perf_counter() - t0, 1)
    return {"raw": int(raw), "cand": int(cand), "pairs": int(pairs), "wall": wall}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from devcontainers_etl_node_spark.generators.synthetic import gen_documents_zipf
    from devcontainers_etl_node_spark.operators.retrieval import setsim_preflight
    from devcontainers_etl_node_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from devcontainers_etl_node_spark.operators.retrieval import (
        setsim_candidate_census,
    )

    print(f"# probe study: n_docs={n} threshold={THRESHOLD} "
          f"start loadavg={os.getloadavg()[0]:.2f}")
    print("| draw | head_mass | distinct ratio | hist screen | census (exact) | "
          "raw measured | post-filter cand | pairs | census/doc | census wall | op wall |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for label, seed, vocab in DRAWS:
        docs = gen_documents_zipf(spark, n, vocab=vocab, seed=seed).localCheckpoint()
        probe = setsim_preflight(docs, THRESHOLD, ngram=NGRAM)
        t0 = time.perf_counter()
        census = setsim_candidate_census(docs, THRESHOLD, ngram=NGRAM).collect()[0]
        t_census = round(time.perf_counter() - t0, 1)
        m = measure(spark, docs, THRESHOLD)
        print(
            f"| {label} | {probe['head_mass']} | {probe['distinct_token_ratio']} "
            f"| {probe['predicted_candidates']} | {census['raw_prefix_collisions']} "
            f"| {m['raw']} | {m['cand']} | {m['pairs']} "
            f"| {census['raw_prefix_collisions'] / n:.2f} | {t_census} s "
            f"| {m['wall']} s |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
