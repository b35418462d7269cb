"""Stage-level profile of minhash_lsh_pairs at sf0.1 (r14 optimization).

Times each internal stage with its own action so the wall decomposes:
  1. shingle_rows persist+count        (explode + xxhash64)
  2. signature table agg  (32 mins)    (groupBy _id, 32 aggregates)
  3. band self-join -> candidate count (banding + join + dropDuplicates)
  4. est-prune joins                   (2 joins vs sig + filter)
  5. exact verify + checkpoint         (semi-join + collect_set + joins)
Run twice; second pass is the warm number (codegen cached).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import dedup
from devcontainers_etl_node_spark.operators.skew import spread
from devcontainers_etl_node_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, label):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    t = {}
    t0 = time.perf_counter()
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, 5).persist(StorageLevel.MEMORY_AND_DISK)
    n_sh = shingle_rows.count()
    t["1_shingles"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sig = dedup.minhash_signature_table(shingle_rows, 32).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = sig.count()
    t["2_signatures"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand0 = dedup.band_candidate_pairs(sig, num_hashes=32, bands=8)
    n_cand0 = cand0.count()
    t["3_band_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = dedup._est_prune_candidates(cand0, sig, 32, 8, 0.5)
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    n_cand = cand.count()
    t["4_est_prune"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    verified = dedup._exact_jaccard_verify(cand, shingle_rows, 0.5)
    out = verified.localCheckpoint(eager=True)
    n_pairs = out.count()
    t["5_verify"] = time.perf_counter() - t0

    for c in (shingle_rows, sig, cand):
        c.unpersist()
    total = sum(t.values())
    print(f"[{label}] shingle_rows={n_sh} docs={n_docs} cand0={n_cand0} cand={n_cand} pairs={n_pairs}")
    for k, v in t.items():
        print(f"[{label}] {k}: {v:.3f}s ({100*v/total:.0f}%)")
    print(f"[{label}] total: {total:.3f}s  loadavg={os.getloadavg()[0]:.2f}")


def main():
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_once(spark, "cold")
    run_once(spark, "warm")
    run_once(spark, "warm2")


if __name__ == "__main__":
    main()
