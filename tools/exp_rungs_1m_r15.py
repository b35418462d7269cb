"""1M-doc rungs for the r14 checkpoint-pin rework (r14 verdict item 4).

Extends the 120k evidence one decade: the incremental and gated+blocked
batch rungs re-run at 1M docs, HEAD (checkpoint pins) vs pre-r14 (eager
persist+count pins) — the scale class where the persisted corpus caches
were the measured memory liability (UNABLE_TO_ACQUIRE_MEMORY, NOTES r12).
Each variant runs in its own process so an OOM/defeat of the old form
cannot poison the HEAD measurement; pair counts printed for cross-run
identity.

Usage:
  git show 7333d05:devcontainers_etl_node_spark/operators/dedup.py > /tmp/dedup_old_r14.py
  python tools/exp_rungs_1m_r15.py incr  <n> old|new
  python tools/exp_rungs_1m_r15.py gated <n> old|new
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.session import get_spark


def load_variant(which: str):
    if which == "new":
        from devcontainers_etl_node_spark.operators import dedup

        return dedup
    spec = importlib.util.spec_from_file_location("dedup_old_r14", "/tmp/dedup_old_r14.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def incr_corpus(spark, n: int):
    # exp_incr_scale_r14 corpus: families {x, x+n/2} straddle the split
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


def gated_corpus(spark, n: int):
    # exp_minhash_gated_r14 corpus: 10% dups in 4-member families whose
    # lang is family-consistent (blocking drops nothing)
    n_dup = n // 10
    fam = (F.col("id") / 4).cast("long")
    fam_words = F.concat_ws(
        " ", *[F.concat(F.lit(f"f{j}x"), fam.cast("string")) for j in range(30)]
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
        F.concat(F.lit("l"), F.pmod(fam, F.lit(4)).cast("string")).alias("lang"),
    )


def main() -> None:
    rung = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    which = sys.argv[3] if len(sys.argv) > 3 else "new"
    mod = load_variant(which)
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"rung={rung} n={n} variant={which} load={os.getloadavg()[0]:.2f}", flush=True)

    if rung == "incr":
        docs = incr_corpus(spark, n).localCheckpoint(eager=True)
        mid = n // 2
        old_docs = docs.filter(F.col("doc_id") <= mid)
        new_docs = docs.filter(F.col("doc_id") > mid)
        old_sigs = mod.minhash_signature_table(
            mod.shingle_hash_rows(
                old_docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
            )
        ).localCheckpoint(eager=True)
        print(f"history={old_sigs.count()}", flush=True)
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
        print(
            f"RESULT incr {which}: pairs={npairs} wall={w:.1f}s jobs={j1 - j0} "
            f"load={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    elif rung == "gated":
        docs = gated_corpus(spark, n).localCheckpoint(eager=True)
        j0 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
        t0 = time.perf_counter()
        out = mod.minhash_lsh_pairs(
            docs, threshold=0.5, block_cols=["lang"], max_collisions_per_doc=1e9
        )
        npairs = out.count()
        w = time.perf_counter() - t0
        j1 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
        print(
            f"RESULT gated {which}: pairs={npairs} wall={w:.1f}s jobs={j1 - j0} "
            f"load={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    else:
        raise SystemExit(f"unknown rung {rung}")


if __name__ == "__main__":
    main()
