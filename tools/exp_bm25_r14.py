"""Quiet A/B of bm25 formulations at sf0.1 (catalog query shape).

B0 original  : 4 corpus postings subtrees (pre-r14 shipped)
B1 window_df : current r14 code (1 corpus explode; df via window over relevant)
B2 group_df  : 1-2 corpus explodes; df via groupBy on vocab-filtered postings
               (parallel branch; subtree may duplicate under pruning)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from devcontainers_etl_node_spark.operators import retrieval
from devcontainers_etl_node_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QT = [(1, ["spark", "window", "hash"]), (2, ["customer", "merge"]), (3, ["vector", "scan", "slow"])]
K1, Bb = 1.2, 0.75


def _score_tail(scored, k=5):
    idf_odds = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tfn = (F.col("tf").cast("double") * F.lit(K1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(K1) * (F.lit(1.0 - Bb) + F.lit(Bb) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    per_term = scored.select(
        "query_id", "doc_id",
        F.round(idf_odds * tfn * F.lit(1000000.0)).cast("long").alias("micros"),
    )
    total = per_term.groupBy("query_id", "doc_id").agg(F.sum("micros").cast("long").alias("score_micros"))
    w = Window.partitionBy("query_id").orderBy(F.col("score_micros").desc(), F.col("doc_id"))
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micros", "rank")
    )


def b0_original(df, spark):
    qdf = retrieval._query_df(spark, QT)
    post = retrieval.postings(df)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    qterms = qdf.select("term").distinct()
    relevant = post.join(F.broadcast(qterms), "term")
    dfreq = relevant.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    matched = relevant.join(F.broadcast(qdf), "term")
    scored = (
        matched.join(F.broadcast(dfreq), "term").join(dl, "doc_id").crossJoin(F.broadcast(stats))
    )
    return _score_tail(scored)


def b1_current(df, spark):
    return retrieval.bm25_topk(df, QT, k=5)


def b2_group_df(df, spark):
    qdf = retrieval._query_df(spark, QT)
    vocab = sorted({t for _, terms in QT for t in terms})
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    matched_toks = df.select(
        F.col("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(vocab))
    post = matched_toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl")
    )
    stats = df.filter(F.col("text").isNotNull()).select(
        F.size(toks).cast("long").alias("dl")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    matched = post.join(F.broadcast(qdf), "term")
    scored = matched.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    return _score_tail(scored)


def main():
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    variants = [("B0_original", b0_original), ("B1_window_df", b1_current), ("B2_group_df", b2_group_df)]
    walls = {n: [] for n, _ in variants}
    for rnd in range(4):
        for name, fn in variants:
            gc.collect()
            sc._jvm.System.gc()
            t0 = time.perf_counter()
            fn(docs, spark).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            if rnd > 0:
                walls[name].append(round(w, 3))
            print(f"r{rnd} {name}: wall={w:.3f} load={os.getloadavg()[0]:.2f}", flush=True)
    for name, _ in variants:
        print(f"SUMMARY {name}: min={min(walls[name])} reps={walls[name]}")
    ref = b0_original(docs, spark)
    for name, fn in variants[1:]:
        out = fn(docs, spark)
        d1 = out.exceptAll(ref).count()
        d2 = ref.exceptAll(out).count()
        print(f"EQ {name}: out-ref={d1} ref-out={d2} EQUAL={d1 == 0 and d2 == 0}")


if __name__ == "__main__":
    main()
