"""Quiet A/B of winnow_fingerprints formulations at sf0.1.

W0 original   : explode chars -> exchange exploded (41B key/char) -> window
W2 doc_repart : explicit-N repartition(docs) -> explode -> window (no AQE coalesce)
W3 map_side   : per-doc arrays, least-of-w sliding min, zero exchanges
All must produce the identical row set.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from devcontainers_etl_node_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K, W = 5, 4


def _norm(df):
    return df.select(
        F.col("doc_id"),
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias("t"),
    ).filter(F.length("t") >= K)


def _tail(selected):
    return selected.select(
        "doc_id",
        (F.lit(999999999) - F.substring("sel", 33, 9).cast("long")).cast("long").alias("pos"),
        F.substring("sel", 1, 32).alias("gram_hash"),
    )


def w0_original(df):
    norm = _norm(df)
    pos = norm.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(1), F.length("t") - (K - 1))).alias("p")
    )
    hashed = pos.select(
        "doc_id", "p",
        F.concat(
            F.md5(F.expr(f"substr(t, p, {K})").cast("binary")),
            F.lpad((F.lit(999999999) - F.col("p")).cast("string"), 9, "0"),
        ).alias("k"),
    )
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(W - 1), 0)
    selected = (
        hashed.withColumn("sel", F.min("k").over(win))
        .filter(F.col("p") >= W)
        .select("doc_id", "sel")
        .distinct()
    )
    return _tail(selected)


def w2_doc_repart(df):
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    norm = _norm(df).repartition(n, "doc_id")
    pos = norm.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(1), F.length("t") - (K - 1))).alias("p")
    )
    hashed = pos.select(
        "doc_id", "p",
        F.concat(
            F.md5(F.expr(f"substr(t, p, {K})").cast("binary")),
            F.lpad((F.lit(999999999) - F.col("p")).cast("string"), 9, "0"),
        ).alias("k"),
    )
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(W - 1), 0)
    selected = (
        hashed.withColumn("sel", F.min("k").over(win))
        .filter(F.col("p") >= W)
        .select("doc_id", "sel")
        .distinct()
    )
    return _tail(selected)


def w3_map_side(df):
    """One projection, no cross-column reference (a _ks column reference
    is inlined by CollapseProject into every consumer — 4x the transform
    tree — measured pathological). The window min recomputes the md5 key
    per window member instead: 4 cheap md5(5 bytes) per position."""
    norm = _norm(df)
    key = (
        f"(q -> concat(md5(cast(substr(t, q, {K}) as binary)), "
        f"lpad(cast(999999999 - q as string), 9, '0')))"
    )
    # named lambda is not SQL; inline textually
    def k_at(off):
        return (
            f"concat(md5(cast(substr(t, p - {off}, {K}) as binary)), "
            f"lpad(cast(999999999 - (p - {off}) as string), 9, '0'))"
        )
    sels = F.expr(
        f"case when length(t) - {K - 1} >= {W} then "
        f"array_distinct(transform(sequence({W}, length(t) - {K - 1}), "
        f"p -> least({k_at(3)}, {k_at(2)}, {k_at(1)}, {k_at(0)}))) "
        f"else array() end"
    )
    out = norm.select("doc_id", F.explode(sels).alias("sel"))
    return _tail(out)


def main():
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    variants = [("W0_original", w0_original), ("W2_doc_repart", w2_doc_repart), ("W3_map_side", w3_map_side)]
    walls = {n: [] for n, _ in variants}
    for rnd in range(4):
        for name, fn in variants:
            gc.collect()
            sc._jvm.System.gc()
            t0 = time.perf_counter()
            out = fn(docs)
            out.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            if rnd > 0:
                walls[name].append(round(w, 3))
            print(f"r{rnd} {name}: wall={w:.3f} load={os.getloadavg()[0]:.2f}", flush=True)
    for name, _ in variants:
        print(f"SUMMARY {name}: min={min(walls[name])} reps={walls[name]}")
    ref = w0_original(docs)
    for name, fn in variants[1:]:
        out = fn(docs)
        d1 = out.exceptAll(ref).count()
        d2 = ref.exceptAll(out).count()
        print(f"EQ {name}: out-ref={d1} ref-out={d2} EQUAL={d1 == 0 and d2 == 0}", flush=True)


if __name__ == "__main__":
    main()
