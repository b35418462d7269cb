"""Reference-architecture comparison: the reference's flagship transform
(eager pandas star-join enrichment, src/etl/etl.py:20-54 semantics) timed
head-to-head against this engine's star_enrich on the same parquet corpus.

The reference itself cannot run here (it needs live Postgres/Kafka/MinIO);
this reimplements its exact pandas call pattern (read-all, two chained
left merges) — the same operations its transform_for_clickhouse performs —
so the number is the reference's *architecture*, not its infra.

Both sides run the same volume: the fact is replicated `xN` (pandas
concat / Spark crossJoin(range(N))) so the crossover where distributed
execution overtakes single-threaded eager pandas is measured, not argued.

Usage: python tools/compare_reference_arch.py [sf_dir] [n_runs] [N,N,...]
"""

from __future__ import annotations

import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")

from devcontainers_etl_node_spark.queries.catalog import table  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402


def pandas_flagship(sf_dir: str, replicate: int = 1) -> pd.DataFrame:
    # eager read of every input up front — the reference's extract stage
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    if replicate > 1:
        orders = pd.concat([orders] * replicate, ignore_index=True)
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    # transform: rename/project + two chained left merges (etl.py:39-45)
    c = customer[["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]].rename(
        columns={"c_name": "customer_name", "c_mktsegment": "segment"}
    )
    n = nation[["n_nationkey", "n_name"]].rename(columns={"n_name": "nation_name"})
    out = orders.merge(c, left_on="o_custkey", right_on="c_custkey", how="left")
    out = out.merge(n, left_on="c_nationkey", right_on="n_nationkey", how="left")
    out["order_date"] = pd.to_datetime(out["o_orderdate"]).dt.date
    return out[
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "order_date",
            "o_totalprice",
            "customer_name",
            "segment",
            "nation_name",
        ]
    ]


def spark_flagship(spark, sf_dir: str, replicate: int = 1):
    from pyspark.sql import functions as F

    orders = table(spark, sf_dir, "orders")
    if replicate > 1:
        orders = orders.crossJoin(spark.range(replicate).select(F.lit(1).alias("_r"))).drop("_r")
    customer = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
    )
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "customer_name",
            "segment",
            "nation_name",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    factors = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [1, 8, 64]

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    print("| fact rows | pandas (ref arch) | this engine | ratio |")
    print("|---|---|---|---|")
    for n in factors:
        pd_times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = pandas_flagship(sf_dir, n)
            pd_times.append(time.perf_counter() - t0)
        rows = len(df)
        del df
        sp_times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spark_flagship(spark, sf_dir, n).write.format("noop").mode("overwrite").save()
            sp_times.append(time.perf_counter() - t0)
        p, s = min(pd_times), min(sp_times)
        print(f"| {rows:,} | {p:.2f}s | {s:.2f}s | {p / s:.2f}x |")




# ---------------------------------------------------------------------------
# Workload 2: exact dedup (the LLM-pipeline shape) — pandas drop_duplicates
# vs the engine's sha2-keyed deterministic dedup, same replicated corpus.
# Run: python tools/compare_reference_arch.py dedup [sf_dir] [n_runs] [N,...]
# ---------------------------------------------------------------------------


def pandas_dedup(sf_dir: str, replicate: int = 1) -> int:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        docs = pd.concat(
            [docs.assign(doc_id=docs.doc_id + i * 10_000_000) for i in range(replicate)],
            ignore_index=True,
        )
    kept = docs.sort_values("doc_id").drop_duplicates(subset=["text"], keep="first")
    return len(kept)


def spark_dedup(spark, sf_dir: str, replicate: int = 1) -> int:
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.operators.dedup import exact_dedup

    docs = table(spark, sf_dir, "documents")
    if replicate > 1:
        docs = (
            docs.crossJoin(spark.range(replicate).select(F.col("id").alias("_r")))
            .withColumn("doc_id", F.col("doc_id") + F.col("_r") * 10_000_000)
            .drop("_r")
        )
    return exact_dedup(docs).count()


def main_dedup() -> None:
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    factors = [int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4 else [1, 8, 64]

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| corpus rows | pandas drop_duplicates | engine exact_dedup | ratio |")
    print("|---|---|---|---|")
    base = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    for n in factors:
        pd_times, sp_times = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            pandas_dedup(sf_dir, n)
            pd_times.append(time.perf_counter() - t0)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spark_dedup(spark, sf_dir, n)
            sp_times.append(time.perf_counter() - t0)
        p, s = min(pd_times), min(sp_times)
        print(f"| {base * n:,} | {p:.2f}s | {s:.2f}s | {p / s:.2f}x |")




# ---------------------------------------------------------------------------
# Workload 3: time-bucketed aggregation (the hourly-rollup shape)
# ---------------------------------------------------------------------------


def pandas_rollup(sf_dir: str, replicate: int = 1):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    if replicate > 1:
        ev = pd.concat([ev] * replicate, ignore_index=True)
    ev["hour"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    return ev.groupby(["hour", "event_type"]).agg(
        n_events=("value", "size"), sum_value=("value", "sum")
    ).reset_index()


def spark_rollup(spark, sf_dir: str, replicate: int = 1) -> int:
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    if replicate > 1:
        factor = spark.range(replicate).select(F.col("id").alias("_r"))
        ev = ev.crossJoin(F.broadcast(factor))
    out = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    return out.count()


def main_rollup() -> None:
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    factors = [int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4 else [1, 8, 64]

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| event rows | pandas groupby | engine rollup | ratio |")
    print("|---|---|---|---|")
    base = len(pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"]))
    for n in factors:
        pd_times, sp_times = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            pandas_rollup(sf_dir, n)
            pd_times.append(time.perf_counter() - t0)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spark_rollup(spark, sf_dir, n)
            sp_times.append(time.perf_counter() - t0)
        p, sx = min(pd_times), min(sp_times)
        print(f"| {base * n:,} | {p:.2f}s | {sx:.2f}s | {p / sx:.2f}x |")




# ---------------------------------------------------------------------------
# Workload 4: MinHash near-dup detection — the family the engine's north
# star centers on. The single-node side is the datasketch-style eager
# implementation a competent pandas/numpy pipeline ships (python shingle
# sets, factorized shingle ids, numpy permutation-hash signatures, band
# bucketing via np.unique, exact-Jaccard verify) — NOT a strawman; the
# engine side is operators/dedup.minhash_lsh_pairs. Both read the SAME
# materialized parquet corpus: n docs of 30 words from a per-replica
# vocabulary, where each (even, odd) id pair shares its first 28 words —
# a planted near-dup per 2 docs, so expected verified pairs ≈ n/2 on
# both sides (band catch probability ~0.99 at 16 hashes / 4 bands for
# Jaccard ~0.9; the exact count is hash-family dependent, so both counts
# are printed next to the times).
# Run: python tools/compare_reference_arch.py minhash [n_runs] [N,...]
# ---------------------------------------------------------------------------

# 32/8 = the shipped library default since the r11 flip (the measured
# scale-correct config); the r6 table in PERF.md was the then-shipped 16/4
_MINHASH_PARAMS = dict(shingle_k=5, num_hashes=32, bands=8, threshold=0.5)


def _minhash_corpus(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    V = 20_000
    # doc 2k+1 reuses doc 2k's first 28 words, own last 2 — one planted
    # near-dup pair per two docs
    base_id = F.col("id") - F.col("id") % 2
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base_id if j < 28 else F.col("id"), F.lit(j)), F.lit(V)).cast("string"),
        )
        for j in range(30)
    ]
    (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text"))
        .write.mode("overwrite")
        .parquet(path)
    )


def pandas_minhash(path: str) -> int:
    import numpy as np

    k = _MINHASH_PARAMS["shingle_k"]
    num_hashes = _MINHASH_PARAMS["num_hashes"]
    bands = _MINHASH_PARAMS["bands"]
    rows_per_band = num_hashes // bands
    threshold = _MINHASH_PARAMS["threshold"]

    docs = pd.read_parquet(path)
    texts = docs["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    # python shingle sets — the eager single-node front half
    shingle_sets = [
        {t[i : i + k] for i in range(max(len(t) - k + 1, 1))} for t in texts
    ]
    doc_idx = np.repeat(
        np.arange(len(shingle_sets)), [len(s) for s in shingle_sets]
    )
    all_shingles = pd.Series([s for ss in shingle_sets for s in ss])
    sid = pd.factorize(all_shingles)[0].astype(np.uint64)
    # numpy permutation-hash signatures: h_i(s) = (a_i*s + b_i) mod p
    p = np.uint64((1 << 61) - 1)
    rng = np.random.RandomState(42)
    a = rng.randint(1, 1 << 60, size=num_hashes).astype(np.uint64)
    b = rng.randint(0, 1 << 60, size=num_hashes).astype(np.uint64)
    sigs = np.full((len(shingle_sets), num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i in range(num_hashes):
        h = (a[i] * sid + b[i]) % p
        np.minimum.at(sigs[:, i], doc_idx, h)
    # banding: bucket docs per band via np.unique over the band rows
    cand = set()
    for bnd in range(bands):
        band = np.ascontiguousarray(sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band])
        view = band.view([("", band.dtype)] * rows_per_band).ravel()
        _, inv, counts = np.unique(view, return_inverse=True, return_counts=True)
        order = np.argsort(inv, kind="stable")
        start = 0
        for c in counts:
            if c > 1:
                members = order[start : start + c]
                for x in range(len(members)):
                    for y in range(x + 1, len(members)):
                        i1, i2 = members[x], members[y]
                        cand.add((min(i1, i2), max(i1, i2)))
            start += c
    # exact-Jaccard verify
    n_pairs = 0
    for i1, i2 in cand:
        s1, s2 = shingle_sets[i1], shingle_sets[i2]
        inter = len(s1 & s2)
        if inter / (len(s1) + len(s2) - inter) >= threshold:
            n_pairs += 1
    return n_pairs


def spark_minhash(spark, path: str) -> int:
    from devcontainers_etl_node_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(spark.read.parquet(path), **_MINHASH_PARAMS).count()


def main_minhash() -> None:
    import os
    import shutil

    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sizes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [20_000, 80_000, 320_000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    workdir = "/root/repo/.bench_tmp"
    os.makedirs(workdir, exist_ok=True)
    print("| docs | pandas minhash (pairs) | engine minhash (pairs) | ratio |")
    print("|---|---|---|---|")
    try:
        for n in sizes:
            path = os.path.join(workdir, f"minhash_{n}.parquet")
            _minhash_corpus(spark, n, path)
            pd_times, sp_times = [], []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                pd_pairs = pandas_minhash(path)
                pd_times.append(time.perf_counter() - t0)
            for _ in range(n_runs):
                t0 = time.perf_counter()
                sp_pairs = spark_minhash(spark, path)
                sp_times.append(time.perf_counter() - t0)
            p, s = min(pd_times), min(sp_times)
            print(
                f"| {n:,} | {p:.2f}s ({pd_pairs:,}) | {s:.2f}s ({sp_pairs:,}) | {p / s:.2f}x |",
                flush=True,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _substr_corpus(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    # doc 2k+1 copies doc 2k's first 16 tokens (one planted shared span
    # per pair), remaining 48 tokens are its own — 64 tokens/doc
    base_id = F.col("id") - F.col("id") % 2
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(base_id if j < 16 else F.col("id"), F.lit(j)), F.lit(1_000_000)
            ).cast("string"),
        )
        for j in range(64)
    ]
    (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text"))
        .write.mode("overwrite")
        .parquet(path)
    )


def pandas_substr(path: str) -> int:
    """Competent single-node ExactSubstr clean: two passes over tokenized
    docs with a dict of per-gram distinct-doc counts (gram = 8-token
    tuple), then per-position coverage + rebuild — the eager equivalent
    of substr_clean_batch on empty history."""
    k = 8
    docs = pd.read_parquet(path)
    toks = [t.lower().strip().split() for t in docs["text"]]
    gram_docs: dict = {}
    for ts in toks:
        for g in {tuple(ts[i : i + k]) for i in range(len(ts) - k + 1)}:
            gram_docs[g] = gram_docs.get(g, 0) + 1
    n_out = 0
    for ts in toks:
        covered = bytearray(len(ts))
        for i in range(len(ts) - k + 1):
            if gram_docs.get(tuple(ts[i : i + k]), 0) >= 2:
                covered[i : i + k] = b"\x01" * k
        if any(c == 0 for c in covered):
            n_out += 1
    return n_out


def spark_substr(spark, path: str) -> int:
    from devcontainers_etl_node_spark.operators.dedup import substr_clean_batch

    history = spark.createDataFrame([], "g LONG, nd LONG")
    clean, _merged, _bc = substr_clean_batch(history, spark.read.parquet(path), k=8)
    return clean.count()


def main_substr() -> None:
    import os
    import shutil

    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sizes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [20_000, 80_000, 320_000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    workdir = "/root/repo/.bench_tmp"
    os.makedirs(workdir, exist_ok=True)
    print("| docs | pandas substr (docs kept) | engine substr (docs kept) | ratio |")
    print("|---|---|---|---|")
    try:
        for n in sizes:
            path = os.path.join(workdir, f"substr_{n}.parquet")
            _substr_corpus(spark, n, path)
            pd_times, sp_times = [], []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                pd_docs = pandas_substr(path)
                pd_times.append(time.perf_counter() - t0)
            for _ in range(n_runs):
                t0 = time.perf_counter()
                sp_docs = spark_substr(spark, path)
                sp_times.append(time.perf_counter() - t0)
            p, s = min(pd_times), min(sp_times)
            print(
                f"| {n:,} | {p:.2f}s ({pd_docs:,}) | {s:.2f}s ({sp_docs:,}) | {p / s:.2f}x |",
                flush=True,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def pandas_unigram(path: str, vocab_size=150, seed_size=300, max_len=4) -> int:
    """The single-node architecture: eager pandas corpus pass + in-process
    EM loops.  The per-word lattice kernel is THE SAME function the
    engine's Arrow pass calls (operators/unigram._forward_backward), so
    the measured delta is architecture — eager single-threaded scan vs
    distributed scan — not kernel quality."""
    import math as _math

    from devcontainers_etl_node_spark.operators import unigram as ug

    df = pd.read_parquet(path)
    words = df["text"].str.lower().str.split().explode()
    wf = [
        (w, int(c))
        for w, c in words[words.str.len() >= 2].value_counts().items()
    ]
    # seed: same rule as ug.seed_vocab
    cnt: dict[str, int] = {}
    for w, n in wf:
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                p = w[i : i + l]
                cnt[p] = cnt.get(p, 0) + n
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    vocab = {p for p, _ in top} | {p for p in cnt if len(p) == 1}
    probs = {p: 1.0 / len(vocab) for p in sorted(vocab)}
    while True:
        for _ in range(2):
            logp = {p: _math.log(v) for p, v in probs.items()}
            counts: dict[str, float] = {}
            for w, n in wf:
                c, _z = ug._forward_backward(w, logp, max_len)
                for p, v in c.items():
                    counts[p] = counts.get(p, 0.0) + n * v
            total = sum(counts.get(p, 0.0) for p in probs)
            probs = {
                p: counts.get(p, 0.0) / total
                for p in probs
                if counts.get(p, 0.0) > 0 or len(p) == 1
            }
            floor = 1.0 / (total * 1e6)
            probs = {p: (v if v > 0 else floor) for p, v in probs.items()}
        if len(probs) <= vocab_size:
            break
        multi = sorted(
            ((p, v) for p, v in probs.items() if len(p) > 1), key=lambda kv: (kv[1], kv[0])
        )
        n_chars = len(probs) - len(multi)
        keep = max(vocab_size - n_chars, int(len(multi) * 0.75))
        if keep >= len(multi):
            break
        for p, _ in multi[: len(multi) - keep]:
            del probs[p]
        total = sum(probs.values())
        probs = {p: v / total for p, v in probs.items()}
    return len(probs)


def spark_unigram(spark, path: str, vocab_size=150, seed_size=300, max_len=4) -> int:
    from devcontainers_etl_node_spark.operators import unigram as ug

    df = spark.read.parquet(path)
    model = ug.unigram_train(
        df, vocab_size=vocab_size, seed_size=seed_size, max_piece_len=max_len
    )
    return len(model)


def main_tokenizer() -> None:
    import os
    import shutil

    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sizes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [20_000, 80_000, 320_000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    workdir = "/root/repo/.bench_tmp"
    os.makedirs(workdir, exist_ok=True)
    print("| docs | single-node unigram train (pieces) | engine (pieces) | ratio |")
    print("|---|---|---|---|")
    try:
        for n in sizes:
            path = os.path.join(workdir, f"tok_{n}.parquet")
            _minhash_corpus(spark, n, path)
            pd_times, sp_times = [], []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                pd_pieces = pandas_unigram(path)
                pd_times.append(time.perf_counter() - t0)
            for _ in range(n_runs):
                t0 = time.perf_counter()
                sp_pieces = spark_unigram(spark, path)
                sp_times.append(time.perf_counter() - t0)
            p, s = min(pd_times), min(sp_times)
            print(
                f"| {n:,} | {p:.2f}s ({pd_pieces}) | {s:.2f}s ({sp_pieces}) | {p / s:.2f}x |",
                flush=True,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)




# --------------------------------------------------------------------------
# Workload 7: BM25 retrieval — single-node pandas inverted index vs engine
# --------------------------------------------------------------------------

_BM25_QUERIES = [
    (1, ["w17", "w4242", "w911"]),
    (2, ["w5", "w19999"]),
    (3, ["w777", "w1234", "w31"]),
]


def pandas_bm25(path: str, k: int = 5, k1: float = 1.2, b: float = 0.75) -> set:
    """The reference-architecture way: eager read, pandas explode/groupby
    postings, vectorized scoring — single process, whole corpus in RAM.
    Same log-free odds idf + integer-micros fixed point as the engine, so
    the result SETS must be identical (asserted by the caller)."""
    import numpy as np

    df = pd.read_parquet(path)
    toks = df.assign(term=df.text.str.lower().str.strip().str.split()).explode("term")
    post = toks.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    dl = post.groupby("doc_id")["tf"].sum()
    n_docs = len(dl)
    avgdl = float(dl.sum()) / float(n_docs)
    qterms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    rel = post[post.term.isin(qterms)]
    dfreq = rel.groupby("term").size()

    out = set()
    for qid, terms in _BM25_QUERIES:
        sub = rel[rel.term.isin(terms)].merge(dl.rename("dl"), on="doc_id")
        if sub.empty:
            continue
        dfq = dfreq[sub.term].to_numpy(dtype="float64")
        idf = ((n_docs - dfq) + 0.5) / (dfq + 0.5)
        tf = sub.tf.to_numpy(dtype="float64")
        dlv = sub.dl.to_numpy(dtype="float64")
        tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dlv / avgdl)))
        # HALF_UP like the engine (np.round is half-even)
        micros = np.floor(idf * tfn * 1000000.0 + 0.5).astype("int64")
        tot = (
            pd.DataFrame({"doc_id": sub.doc_id.to_numpy(), "m": micros})
            .groupby("doc_id")["m"]
            .sum()
            .reset_index()
            .sort_values(["m", "doc_id"], ascending=[False, True])
            .head(k)
        )
        out |= {(qid, int(r.doc_id), int(r.m)) for r in tot.itertuples()}
    return out


def spark_bm25(spark, path: str, k: int = 5) -> set:
    from devcontainers_etl_node_spark.operators import retrieval

    rows = retrieval.bm25_topk(
        spark.read.parquet(path), _BM25_QUERIES, k=k
    ).collect()
    return {(r["query_id"], r["doc_id"], r["score_micros"]) for r in rows}


def main_bm25() -> None:
    import os
    import shutil

    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sizes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [20_000, 80_000, 320_000]
    )
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    workdir = "/root/repo/.bench_tmp"
    os.makedirs(workdir, exist_ok=True)
    print("| docs | pandas bm25 | engine bm25 | ratio | results identical |")
    print("|---|---|---|---|---|")
    try:
        for n in sizes:
            path = os.path.join(workdir, f"bm25_{n}.parquet")
            _minhash_corpus(spark, n, path)  # same 20k-vocab synthetic corpus
            pd_times, sp_times = [], []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                pd_res = pandas_bm25(path)
                pd_times.append(time.perf_counter() - t0)
            for _ in range(n_runs):
                t0 = time.perf_counter()
                sp_res = spark_bm25(spark, path)
                sp_times.append(time.perf_counter() - t0)
            same = pd_res == sp_res
            p, s = min(pd_times), min(sp_times)
            print(
                f"| {n:,} | {p:.2f}s | {s:.2f}s | {p / s:.2f}x | {same} |",
                flush=True,
            )
            assert same, "pandas and engine BM25 diverged"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# workload 8: transactional upsert — pandas full-rewrite vs pruned tx_merge
# ---------------------------------------------------------------------------


def _merge_table(spark, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 1000).cast("double").alias("payload"),
        )
        .repartitionByRange(16, "id")
        .sortWithinPartitions("id")
    )


def _merge_updates(n: int):
    # 100 keys inside ONE clustered file's range
    base = n // 32
    return [(base + i, 9999.0) for i in range(100)]


def pandas_merge(path: str, updates: list[tuple]) -> tuple[int, float]:
    """The reference's file-table upsert architecture: read the whole
    table, apply the changelog in memory, rewrite the whole table (its
    DB loaders get upsert server-side; on files this is the only eager
    single-node shape)."""
    df = pd.read_parquet(path)
    upd = pd.DataFrame(updates, columns=["id", "payload"])
    df = pd.concat([df[~df["id"].isin(set(upd["id"]))], upd], ignore_index=True)
    df.to_parquet(f"{path}/merged.parquet")  # the rewrite IS the cost
    return len(df), float(df["payload"].sum())


def spark_merge(spark, root: str, updates: list[tuple]) -> tuple[int, float, int]:
    from devcontainers_etl_node_spark.sinks import txlog

    upd = spark.createDataFrame(updates, "id LONG, payload DOUBLE")
    v = txlog.tx_merge(spark, upd, root, key="id")
    m = txlog._read_manifest(root, v)
    out = txlog.tx_read(spark, root).agg(
        {"payload": "sum", "*": "count"}
    ).collect()[0]
    return int(out["count(1)"]), float(out["sum(payload)"]), len(m["removed"])


def main_merge() -> None:
    import glob as _glob
    import shutil
    import tempfile

    from devcontainers_etl_node_spark.sinks import txlog

    sizes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1_000_000, 4_000_000, 16_000_000]
    )
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    workdir = tempfile.mkdtemp(prefix="arch_merge_")
    print("| rows | pandas full-rewrite | engine tx_merge | ratio | files rewritten | same |")
    print("|---|---|---|---|---|---|")
    try:
        for n in sizes:
            updates = _merge_updates(n)
            pd_times, sp_times = [], []
            pd_res = sp_res = None
            rewritten = None
            for _ in range(n_runs):
                # fresh tables per rep: merge mutates
                ppath = f"{workdir}/plain_{n}"
                shutil.rmtree(ppath, ignore_errors=True)
                _merge_table(spark, n).write.parquet(ppath)
                t0 = time.perf_counter()
                pd_res = pandas_merge(ppath, updates)
                pd_times.append(time.perf_counter() - t0)

                root = f"{workdir}/tx_{n}"
                shutil.rmtree(root, ignore_errors=True)
                txlog.tx_write(_merge_table(spark, n), root)
                t0 = time.perf_counter()
                cnt, total, rewritten = spark_merge(spark, root, updates)
                sp_times.append(time.perf_counter() - t0)
                sp_res = (cnt, total)
            same = (
                pd_res[0] == sp_res[0] and abs(pd_res[1] - sp_res[1]) < 1e-6
            )
            p, s = min(pd_times), min(sp_times)
            n_files = len(_glob.glob(f"{workdir}/tx_{n}/data/*.parquet"))
            print(
                f"| {n:,} | {p:.2f}s | {s:.2f}s | {p / s:.2f}x | "
                f"{rewritten}/{n_files} | {same} |",
                flush=True,
            )
            assert same, "pandas and engine merge results diverged"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dedup":
        main_dedup()
    elif len(sys.argv) > 1 and sys.argv[1] == "rollup":
        main_rollup()
    elif len(sys.argv) > 1 and sys.argv[1] == "minhash":
        main_minhash()
    elif len(sys.argv) > 1 and sys.argv[1] == "substr":
        main_substr()
    elif len(sys.argv) > 1 and sys.argv[1] == "tokenizer":
        main_tokenizer()
    elif len(sys.argv) > 1 and sys.argv[1] == "bm25":
        main_bm25()
    elif len(sys.argv) > 1 and sys.argv[1] == "merge":
        main_merge()
    else:
        main()
