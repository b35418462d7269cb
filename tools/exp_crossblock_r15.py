"""A/B of the r15 cross-block-recovery shingle-cache removal (verdict item 8).

A = r14 HEAD operator (corpus-wide shingle_rows persisted MEMORY_AND_DISK
    across the whole blocked+recovery pass, threaded into the recovery's
    rep-signature build and exact verify) — /tmp/dedup_r15_pre_crossblock.py
B = r15 operator (no persist anywhere: rep shingles and the candidate
    verify re-derive from the DOC table below id semi-joins)

Corpus: dup families {x, x+n/2} (id%10==0 share family boilerplate) with
lang drawn independently of family (pmod(xxhash64(id), 4)), so most true
pairs SPAN lang blocks — the recovery pass does real work.

Usage:
  python tools/exp_crossblock_r15.py [n_docs] [rounds]
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

spec = importlib.util.spec_from_file_location(
    "dedup_pre_crossblock_r15", "/tmp/dedup_r15_pre_crossblock.py"
)
dedup_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dedup_old)


def corpus(spark, n: int):
    mid = n // 2
    fam = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"f{j}x"), F.pmod(F.col("id"), F.lit(mid)).cast("string"))
            for j in range(30)
        ],
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
        F.when(F.col("id") % 10 == 0, fam).otherwise(uniq).alias("text"),
        F.concat(F.lit("l"), F.pmod(F.xxhash64("id"), F.lit(4)).cast("string")).alias("lang"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = corpus(spark, n).localCheckpoint(eager=True)
    print(f"n={n}; load={os.getloadavg()[0]:.2f}")

    variants = [("A_persist_cache", dedup_old), ("B_from_base", dedup_new)]
    ref = None
    for rnd in range(rounds):
        for name, mod in variants:
            gc.collect()
            sc._jvm.System.gc()
            j0 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            pairs = mod.minhash_lsh_pairs(
                docs, threshold=0.5, block_cols=["lang"], cross_block_recovery=True
            )
            wall = time.perf_counter() - t0
            j1 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            got = frozenset(
                (r.id_a, r.id_b, round(r.jaccard_sim, 9)) for r in pairs.collect()
            )
            if ref is None:
                ref = got
            print(
                f"r{rnd} {name}: pairs={len(got)} eq={got == ref} wall={wall:.2f}s "
                f"jobs={j1 - j0} load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
