"""Scale-rung arbitration of the r14 minhash one-DAG restructure.

The r10 dead-end table (PERF.md) showed that dropping the eager count
with a LAZY persist regresses 6.3x at 250k docs (two self-join sides
racing a cold cache recompute the full shingle+agg lineage). The r14
structure drops the persists ENTIRELY and relies on within-action
exchange reuse instead — a different mechanism whose scale behaviour
must be measured, not assumed. This interleaves:

  A pre-r14 shipped structure (persist+count x3)
  C r14 one-DAG, verify re-shingled from candidate-pruned docs

on the bench_dedup_scale synthetic corpus. Pair-set equality asserted.

Usage: python tools/exp_minhash_scale_r14.py [n_docs] [rounds]
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
from devcontainers_etl_node_spark.session import get_spark

H, B, K, T = 32, 8, 5, 0.5


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
        F.col("id").alias("_id"),
        F.when(F.col("id") < n_dup, F.concat_ws(" ", fam_words, tail)).otherwise(uniq).alias("_text"),
    )


def shipped(base):
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


def one_dag_cd(base):
    shingle_rows = dedup.shingle_hash_rows(base, K)
    sig = dedup.minhash_signature_table(shingle_rows, H)
    cand = dedup.band_candidate_pairs(sig, num_hashes=H, bands=B)
    cand = dedup._est_prune_candidates(cand, sig, H, B, T)
    return dedup._exact_jaccard_verify_from_base(cand, base, K, T).localCheckpoint(eager=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = corpus(spark, n).localCheckpoint(eager=True)
    print(f"n={n} docs (checkpointed corpus)")

    variants = [("A_shipped", shipped), ("C_onedag_cd", one_dag_cd)]
    ref = None
    for rnd in range(rounds):
        for name, fn in variants:
            gc.collect()
            sc._jvm.System.gc()
            j0 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            out = fn(base)
            npairs = out.count()
            w = time.perf_counter() - t0
            j1 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            s = {(r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in out.collect()}
            if ref is None:
                ref = s
            print(
                f"r{rnd} {name}: pairs={npairs} eq={s == ref} wall={w:.3f} "
                f"jobs={j1 - j0} load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
