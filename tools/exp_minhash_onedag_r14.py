"""r14 experiment: can minhash_lsh_pairs run as ONE lazy DAG (no eager
persist/count jobs) and rely on AQE exchange/stage reuse to keep the band
self-join + signature agg computed once?

Compares:
  A) shipped operator (3 sequential actions: sig.count, cand.count, ckpt)
  B) one-DAG variant: same lineage, no persists, single localCheckpoint
Checks pair-set equality and reports walls + a rough job count via the
status tracker.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import dedup
from devcontainers_etl_node_spark.operators.skew import spread
from devcontainers_etl_node_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def one_dag(docs, num_hashes=32, bands=8, threshold=0.5, shingle_k=5):
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, shingle_k)
    sig = dedup.minhash_signature_table(shingle_rows, num_hashes)
    cand = dedup.band_candidate_pairs(sig, num_hashes=num_hashes, bands=bands)
    cand = dedup._est_prune_candidates(cand, sig, num_hashes, bands, threshold)
    verified = dedup._exact_jaccard_verify(cand, shingle_rows, threshold)
    return verified.localCheckpoint(eager=True)


def main():
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    for label, fn in [
        ("shipped", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5)),
        ("one_dag", lambda: one_dag(docs)),
        ("shipped2", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5)),
        ("one_dag2", lambda: one_dag(docs)),
        ("shipped3", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5)),
        ("one_dag3", lambda: one_dag(docs)),
    ]:
        import gc
        gc.collect()
        sc._jvm.System.gc()
        j0 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        t0 = time.perf_counter()
        out = fn()
        n = out.count()
        wall = time.perf_counter() - t0
        j1 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        print(f"[{label}] pairs={n} wall={wall:.3f}s jobs={len(j1) - len(j0)} load={os.getloadavg()[0]:.2f}")
        if label == "shipped":
            ship_set = {(r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in out.collect()}
        if label == "one_dag":
            dag_set = {(r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in out.collect()}
            print("PAIR SETS EQUAL:", ship_set == dag_set, len(ship_set), len(dag_set))


if __name__ == "__main__":
    main()


def variant_c(docs, num_hashes=32, bands=8, threshold=0.5, shingle_k=5):
    """Keep shingle_rows persisted (one text scan), single action otherwise."""
    from pyspark import StorageLevel
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, shingle_k).persist(StorageLevel.MEMORY_AND_DISK)
    sig = dedup.minhash_signature_table(shingle_rows, num_hashes)
    cand = dedup.band_candidate_pairs(sig, num_hashes=num_hashes, bands=bands)
    cand = dedup._est_prune_candidates(cand, sig, num_hashes, bands, threshold)
    verified = dedup._exact_jaccard_verify(cand, shingle_rows, threshold)
    out = verified.localCheckpoint(eager=True)
    shingle_rows.unpersist()
    return out
