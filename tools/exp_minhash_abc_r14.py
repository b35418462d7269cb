"""Quiet A/B/C of minhash_lsh_pairs structures at sf0.1 (ungated path).

A shipped   : pre-r14 structure (persist shingle/sig/cand + eager counts)
B one_dag_sh: single action, verify from corpus-wide (lazy) shingle rows
C one_dag_cd: single action, verify from candidate-pruned doc re-shingle
Interleaved reps cancel load drift; prints walls + job counts.
"""

from __future__ import annotations

import gc
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
H, B, K, T = 32, 8, 5, 0.5


def shipped(docs):
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, K).persist(StorageLevel.MEMORY_AND_DISK)
    sig = dedup.minhash_signature_table(shingle_rows, H).persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    cand = dedup.band_candidate_pairs(sig, num_hashes=H, bands=B)
    cand = dedup._est_prune_candidates(cand, sig, H, B, T).persist(StorageLevel.MEMORY_AND_DISK)
    cand.count()
    out = dedup._exact_jaccard_verify(cand, shingle_rows, T).localCheckpoint(eager=True)
    for c in (sig, cand, shingle_rows):
        c.unpersist()
    return out


def one_dag_sh(docs):
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, K)
    sig = dedup.minhash_signature_table(shingle_rows, H)
    cand = dedup.band_candidate_pairs(sig, num_hashes=H, bands=B)
    cand = dedup._est_prune_candidates(cand, sig, H, B, T)
    return dedup._exact_jaccard_verify(cand, shingle_rows, T).localCheckpoint(eager=True)


def one_dag_cd(docs):
    base = spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
    shingle_rows = dedup.shingle_hash_rows(base, K)
    sig = dedup.minhash_signature_table(shingle_rows, H)
    cand = dedup.band_candidate_pairs(sig, num_hashes=H, bands=B)
    cand = dedup._est_prune_candidates(cand, sig, H, B, T)
    return dedup._exact_jaccard_verify_from_base(cand, base, K, T).localCheckpoint(eager=True)


def main():
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    variants = [("A_shipped", shipped), ("B_onedag_sh", one_dag_sh), ("C_onedag_cd", one_dag_cd)]
    ref = None
    walls = {n: [] for n, _ in variants}
    # warmup round (codegen) then 3 measured interleaved rounds
    for rnd in range(4):
        for name, fn in variants:
            gc.collect()
            sc._jvm.System.gc()
            j0 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            out = fn(docs)
            n = out.count()
            w = time.perf_counter() - t0
            j1 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            s = {(r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in out.collect()}
            if ref is None:
                ref = s
            if rnd > 0:
                walls[name].append(round(w, 3))
            print(f"r{rnd} {name}: pairs={n} eq={s == ref} wall={w:.3f} "
                  f"jobs={len(j1) - len(j0)} load={os.getloadavg()[0]:.2f}", flush=True)
    for name, _ in variants:
        print(f"SUMMARY {name}: min={min(walls[name])} reps={walls[name]}")


if __name__ == "__main__":
    main()
