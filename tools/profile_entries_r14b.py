"""Phase decomposition of the two heaviest bench entries at sf0.1
(r14 optimization round, second pass): where do minhash_neardup's ~5 s
and pretrain_prep's ~7 s actually go?

minhash_neardup (one-DAG operator): partial pipelines, each its own
noop action — the deltas between cumulative walls bound each phase's
cost (same-action subtree reuse means the full call can be cheaper
than the sum; that gap is itself reported).

pretrain_prep: the funnel checkpoints at each stage boundary, so the
stage walls are measured directly by replicating the entry's structure
and timing each eager materialization.

Run on a QUIET box; 2 warm reps each, best reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import dedup
from devcontainers_etl_node_spark.operators.skew import spread
from devcontainers_etl_node_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best2(fn):
    reps = []
    for _ in range(2):
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        reps.append(round(time.perf_counter() - t0, 3))
    return reps


spark = get_spark()
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
out = {"loadavg": os.getloadavg()[0]}

# ---- minhash_neardup phases ----
def mk_base():
    return spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))


def p_sig():
    sig = dedup.minhash_signature_table(dedup.shingle_hash_rows(mk_base(), 5), 32)
    noop(sig)


def p_band():
    sig = dedup.minhash_signature_table(dedup.shingle_hash_rows(mk_base(), 5), 32)
    cand = dedup.band_candidate_pairs(sig, num_hashes=32, bands=8)
    noop(cand)


def p_est():
    sig = dedup.minhash_signature_table(dedup.shingle_hash_rows(mk_base(), 5), 32)
    cand = dedup.band_candidate_pairs(sig, num_hashes=32, bands=8)
    cand = dedup._est_prune_candidates(cand, sig, 32, 8, 0.5)
    noop(cand)


def p_full():
    dedup.minhash_lsh_pairs(docs, threshold=0.5)


out["mh_1_sig"] = best2(p_sig)
out["mh_2_band(cum)"] = best2(p_band)
out["mh_3_est(cum)"] = best2(p_est)
out["mh_4_full_entry"] = best2(p_full)

# ---- pretrain_prep stages (mirrors the catalog entry's structure) ----
from pyspark.sql import Window

from devcontainers_etl_node_spark import funnel as _funnel
from devcontainers_etl_node_spark.operators import packing, text as tx


def pp_run():
    t = {}
    t0 = time.perf_counter()
    _docs = docs
    _block_cols = _funnel.default_block_cols(_docs)
    ann = spread(_docs).select(
        "doc_id",
        "text",
        "lang",
        *[c for c in _block_cols if c not in ("doc_id", "text", "lang")],
        tx.token_count("text").alias("n_tokens"),
        ((F.length("text") >= 50) & (tx.quality_score("text") >= 0.2)).alias("_gate"),
    )
    _h = F.sha2(F.col("text"), 256)
    _w = Window.partitionBy(_h).orderBy(F.col("doc_id"))
    exact = (
        ann.filter("_gate")
        .withColumn("_rn", F.row_number().over(_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_gate")
        .localCheckpoint(eager=True)
    )
    t["1_gate+exact_ckpt"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_exact = exact.count()
    t["1b_count"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    with dedup.applied_partition_plan(spark, max(1, n_exact)):
        pairs = dedup.minhash_lsh_pairs(
            exact,
            threshold=0.5,
            block_cols=_block_cols or None,
            max_collisions_per_doc=_funnel.DEFAULT_NEARDUP_BUDGET,
        )
    t["2_minhash_gated"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    near_drop = pairs.select(F.col("id_b").alias("doc_id"))
    neardeduped = exact.join(near_drop, "doc_id", "left_anti").localCheckpoint(eager=True)
    t["3_neardedup_ckpt"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()

    def _gram_rows(src, with_id):
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        exploded = src.select(*(["doc_id"] if with_id else []), toks.alias("_t")).select(
            *(["doc_id"] if with_id else []),
            "_t",
            F.explode(F.sequence(F.lit(0), F.greatest(F.size("_t") - 3, F.lit(0)))).alias("_i"),
        )
        gram_h = F.xxhash64(F.concat_ws(" ", F.slice("_t", F.col("_i") + 1, 3))).alias("gram_h")
        return exploded.select(*(["doc_id"] if with_id else []), gram_h)

    bench_grams = _gram_rows(
        docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text"), with_id=False
    ).distinct()
    doc_grams = _gram_rows(neardeduped.filter(F.col("doc_id") % 10 != 0), with_id=True)
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), "gram_h", "left_semi").select("doc_id").distinct()
    )
    clean = (
        neardeduped.filter(F.col("doc_id") % 10 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    t["4_decontam_ckpt"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    packed = packing.pack_sequences(clean, "n_tokens", "lang", "doc_id", max_tokens=512)
    packed_summary = packed.agg(
        F.lit(5).alias("stage_no"),
        F.lit("packed").alias("stage"),
        F.countDistinct(F.concat_ws("|", "group", "seq_id")).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    )
    packed_summary.collect()
    t["5_packing"] = round(time.perf_counter() - t0, 3)
    t["total"] = round(sum(v for k, v in t.items()), 3)
    return t


out["pp_rep1"] = pp_run()
out["pp_rep2"] = pp_run()
out["loadavg_end"] = os.getloadavg()[0]
print(json.dumps(out, indent=1))
