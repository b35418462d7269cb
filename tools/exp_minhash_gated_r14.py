"""Gated+blocked batch minhash (the pretrain_prep config): persist-pinned
signature table vs localCheckpoint-pinned, at a scale rung.

The census gate makes the operator multi-action, so `sig` must be pinned
— but a persisted InMemoryRelation canonicalizes per consumer and the
main action's repeated sig subtrees (band self-join a/b, est-prune x2,
verify) may lose ReusedExchange, like the incremental case
(tools/exp_incr_scale_r14.py: checkpoint pin 2.8x faster). This measures
the same substitution for the batch gated path.

  B sig.persist + count   (shipped)
  C sig.localCheckpoint   (candidate)

Usage: python tools/exp_minhash_gated_r14.py [n_docs] [rounds]
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

# build the checkpoint-pin variant module from the live source
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "devcontainers_etl_node_spark", "operators", "dedup.py",
)
_old = "        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)\n        n_docs = sig.count()"
_new = "        sig = sig.localCheckpoint(eager=True)\n        n_docs = sig.count()"
src = open(_SRC).read()
assert src.count(_old) == 1
open("/tmp/dedup_bckpt_r14.py", "w").write(src.replace(_old, _new))
spec = importlib.util.spec_from_file_location("dedup_bckpt_r14", "/tmp/dedup_bckpt_r14.py")
dedup_ckpt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dedup_ckpt)


def corpus(spark, n: int):
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
        # family members share id//4, hence lang — blocking drops nothing
        F.concat(F.lit("l"), F.pmod(fam, F.lit(4)).cast("string")).alias("lang"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = corpus(spark, n).localCheckpoint(eager=True)
    print(f"n={docs.count()} docs")

    def run(mod):
        return mod.minhash_lsh_pairs(
            docs, threshold=0.5, block_cols=["lang"], max_collisions_per_doc=1e9
        )

    variants = [("B_persist", dedup_new), ("C_ckpt", dedup_ckpt)]
    ref = None
    for rnd in range(rounds):
        for name, mod in variants:
            gc.collect()
            sc._jvm.System.gc()
            j0 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            out = run(mod)
            npairs = out.count()
            w = time.perf_counter() - t0
            j1 = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
            if ref is None:
                ref = npairs
            print(
                f"r{rnd} {name}: pairs={npairs} eq={npairs == ref} wall={w:.3f} "
                f"jobs={j1 - j0} load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
