"""Interleaved A/B of the r14 minhash_incremental_pairs restructure.

A = pre-r14 operator (HEAD~1 dedup.py, loaded as a standalone module):
    cand persist+count, sh persist+count.
B = r14 operator (installed package): cand unpinned (no store_buckets),
    sh lazy — the verify is ONE action relying on exchange reuse.

Same history snapshot (checkpointed once, shared), same inputs as the
bench cadence entry at $SPARK_GRAFT_SF_DIR. Pair-set equality asserted.

Usage:
  git show HEAD~1:devcontainers_etl_node_spark/operators/dedup.py > /tmp/dedup_old_r14.py
  python tools/exp_incr_ab_r14.py [rounds]
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spec = importlib.util.spec_from_file_location("dedup_old_r14", "/tmp/dedup_old_r14.py")
dedup_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dedup_old)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    old_docs = docs.filter(F.col("doc_id") <= mid)
    new_docs = docs.filter(F.col("doc_id") > mid)
    old_sigs = dedup_new.minhash_signature_table(
        dedup_new.shingle_hash_rows(
            old_docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
        )
    ).localCheckpoint(eager=True)
    old_sigs.count()

    variants = [("A_prer14", dedup_old), ("B_r14", dedup_new)]
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
            s = {(r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in pairs.collect()}
            if ref is None:
                ref = s
            print(
                f"r{rnd} {name}: pairs={len(s)} eq={s == ref} wall={w:.3f} "
                f"jobs={j1 - j0} load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
