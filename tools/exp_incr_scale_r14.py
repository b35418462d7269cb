"""Scale-rung A/B of the r14 minhash_incremental_pairs restructure.

Same variants as exp_incr_ab_r14.py (A = HEAD~1 operator from
/tmp/dedup_old_r14.py, B = r14 operator) but on the bench_dedup_scale
synthetic corpus split at the id median — so the unpinned-candidate
question ("does AQE reuse the band-join exchange, or is it recomputed
per consumer at scale?") is answered by measurement at a rung where the
band join dominates.

Usage:
  git show <old>:devcontainers_etl_node_spark/operators/dedup.py > /tmp/dedup_old_r14.py
  python tools/exp_incr_scale_r14.py [n_docs] [rounds]
"""

from __future__ import annotations

import gc
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import dedup as dedup_new
from devcontainers_etl_node_spark.session import get_spark

spec = importlib.util.spec_from_file_location("dedup_old_r14", "/tmp/dedup_old_r14.py")
dedup_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dedup_old)

# C: r14 structure but the new-batch pins are eager localCheckpoints, so
# the frames canonicalize as plain RDD scans and the single verify
# action's repeated cand/sh subtrees hit ReusedExchange instead of
# replicating (the 57-job fragmentation signature).
spec_c = importlib.util.spec_from_file_location("dedup_ckpt_r14", "/tmp/dedup_ckpt_r14.py")
dedup_ckpt = importlib.util.module_from_spec(spec_c)
spec_c.loader.exec_module(dedup_ckpt)


def corpus(spark, n: int):
    # near-dup pairs STRADDLE the id median: ids with id%10==0 share
    # family boilerplate keyed by id % (n/2), so each family is
    # {x, x+n/2} — one historical member, one arriving member — and every
    # true pair touches a new doc (the incremental verify path is
    # exercised, unlike the batch-scale corpus whose families all sit
    # below the median).
    mid = n // 2
    fam_words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"f{j}x"), F.pmod(F.col("id"), F.lit(mid)).cast("string"))
            for j in range(30)
        ],
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
        F.when(F.col("id") % 10 == 0, F.concat_ws(" ", fam_words, tail)).otherwise(uniq).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = corpus(spark, n).localCheckpoint(eager=True)
    mid = n // 2
    old_docs = docs.filter(F.col("doc_id") <= mid)
    new_docs = docs.filter(F.col("doc_id") > mid)
    old_sigs = dedup_new.minhash_signature_table(
        dedup_new.shingle_hash_rows(
            old_docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
        )
    ).localCheckpoint(eager=True)
    print(f"n={n} docs, history={old_sigs.count()}")

    variants = [("A_prer14", dedup_old), ("B_r14", dedup_new), ("C_ckpt", dedup_ckpt)]
    ref = None
    for rnd in range(rounds):
        for name, mod in variants:
            gc.collect()
            sc._jvm.System.gc()
            j0 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            pairs, _sigs, release = mod.minhash_incremental_pairs(
                old_docs, old_sigs, new_docs, threshold=0.5
            )
            release()
            pairs.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            j1 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            npairs = pairs.count()
            if ref is None:
                ref = npairs
            print(
                f"r{rnd} {name}: pairs={npairs} eq={npairs == ref} wall={w:.3f} "
                f"jobs={j1 - j0} load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
