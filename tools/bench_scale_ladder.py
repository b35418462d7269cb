"""End-to-end scale ladder for the heavy LLM catalog entries.

The 100 TB claims for the dedup/retrieval family were argued from plan
shape (bucketed candidate generation, bounded verify) plus targeted
probes; this tool turns them into MEASURED scaling exponents by running
the actual catalog entries — `minhash_neardup`, `setsim_selfjoin`,
`dup_clusters`, `bm25_retrieval`, `pretrain_prep` — unchanged against
synthetic corpora at 1x / 10x / 50x the sf0.1 document count (5 k /
50 k / 250 k docs by default).

Corpus design (realistic vocabulary spread, not the 31-word adversarial
sweep corpus):

- 90% unique docs of 45 words drawn ZIPF(1)-distributed from a 30 k
  vocabulary: word j of doc id is ``w⌊V^u⌋`` with
  ``u = pmod(xxhash64(id, j), 10^6) / 10^6`` — P(rank k) ≈ 1/(k·lnV),
  so token frequencies have a realistic head/tail and the distinct-gram
  space grows sub-linearly (Heaps-like), unlike a uniform draw.
- 10% near-duplicate docs in 4-member families (38 shared boilerplate
  words + 7 unique tail words, Jaccard ≈ 0.73 > the 0.5 threshold), so
  the TRUE pair output is 6 pairs/family — linear in corpus size, never
  quadratic: the ladder measures algorithm cost, not output volume.
- lang ∈ {en 60%, de 30%, fr 10%}, source ∈ 5 values, n_chars =
  length(text) — the full documents schema, so every entry runs as-is.

For each rung each entry runs twice (gc + JVM System.gc between reps;
rep 1 of the dedup family builds the session pair-graph memo cold, rep 2
is the long-lived-session number — both are printed).  The summary
table reports best-rep wall and the fitted exponent
``alpha = ln(t_hi/t_lo) / ln(n_hi/n_lo)`` between consecutive rungs and
end-to-end; alpha <= ~1.1 is linear scaling, >= ~1.5 flags a
super-linear stage (fixed JVM/codegen overhead makes small-rung alphas
UNDER-estimate; the top-gap alpha is the honest one).

Spill gate (``--spill <docs_dir>``): re-runs `minhash_lsh_pairs` on the
top-rung corpus in a memory-starved JVM (1 g driver, memory.fraction
0.2, broadcast joins disabled — the spill_probe.py recipe) and reads the
spill totals back from the UI REST API: the rung must COMPLETE by
spilling, not OOM.

Usage:
    python tools/bench_scale_ladder.py [sizes_csv]      # default 5000,50000,250000
    python tools/bench_scale_ladder.py --spill /tmp/scale_ladder/docs_v2_250000
    python tools/bench_scale_ladder.py --bm25 [sizes_csv]

Paste the table into PERF.md when it changes.
"""

from __future__ import annotations

import gc
import json
import math
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROOT = "/tmp/scale_ladder"
ENTRIES = [
    "minhash_neardup",
    "setsim_selfjoin",
    "dup_clusters",
    "bm25_retrieval",
    "pretrain_prep",
    "winnow_fingerprints",
]
# small aggregate outputs are collected; row-heavy outputs go to the
# noop sink (same methodology as bench.py)
SMALL_OUTPUT = {"dup_clusters", "pretrain_prep", "bm25_retrieval"}


def gen_documents(spark, n: int, out_dir: str) -> None:
    """Write a documents.parquet twin with a Zipfian vocabulary corpus
    (generators/synthetic.py:gen_documents_zipf — the library form of
    the corpus this tool's round-10 numbers were measured on; the
    seeded hash family differs from the round-10 in-tool draft, so dirs
    are versioned to avoid mixing corpora across tool versions)."""
    from devcontainers_etl_node_spark.generators.synthetic import gen_documents_zipf

    docs = gen_documents_zipf(spark, n)
    # ~12.5k docs (~4 MB of text) per file: realistic multi-file layout
    docs.repartition(max(1, n // 12_500)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def run_ladder(sizes: list[int], n_reps: int = 2, entries: list[str] | None = None) -> None:
    from devcontainers_etl_node_spark.queries.catalog import QUERIES
    from devcontainers_etl_node_spark.session import get_spark

    entries = entries or ENTRIES
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"# ladder start loadavg={os.getloadavg()[0]:.2f} reps={n_reps} entries={entries}")

    results: dict[int, dict[str, list[float]]] = {}
    for n in sizes:
        d = os.path.join(ROOT, f"docs_v2_{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            gen_documents(spark, n, d)
        results[n] = {}
        for name in entries:
            reps = []
            for _ in range(n_reps):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df = QUERIES[name](spark, d)
                if name in SMALL_OUTPUT:
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 3))
            results[n][name] = reps
            print(
                f"  n={n:>7} {name:<18} reps={reps} load={os.getloadavg()[0]:.1f}",
                flush=True,
            )

    print("\n| entry | " + " | ".join(f"{n} docs" for n in sizes) + " | " +
          " | ".join(
              f"alpha {sizes[i]}->{sizes[i+1]}" for i in range(len(sizes) - 1)
          ) + " | alpha overall |")
    print("|---" * (len(sizes) * 2 + 1) + "|")
    for name in entries:
        best = [min(results[n][name]) for n in sizes]
        alphas = [
            math.log(best[i + 1] / best[i]) / math.log(sizes[i + 1] / sizes[i])
            for i in range(len(sizes) - 1)
        ]
        overall = math.log(best[-1] / best[0]) / math.log(sizes[-1] / sizes[0])
        print(
            f"| {name} | "
            + " | ".join(f"{b:.2f} s" for b in best)
            + " | "
            + " | ".join(f"{a:.2f}" for a in alphas)
            + f" | {overall:.2f} |"
        )
    print(json.dumps({"sizes": sizes, "reps": results}))


def run_spill(docs_dir: str, block_key: str | None = None) -> None:
    """Top-rung spill gate: the band join must complete by spilling under
    a ~35 MB/task execution budget (own JVM — heap is a start setting).
    ``--block lang|b100`` runs the BLOCKED operator instead (r12 task 2:
    the gate must hold on both block keys at the top rung)."""
    from pyspark.sql import SparkSession

    # 2 g heap / fraction 0.2 => ~400 MB unified pool (~100 MB/task):
    # far below the rung's multi-GB shuffle working set, so completion
    # requires spilling. (1 g/0.2 is BELOW the minimum operator page
    # budget for this pipeline at 250 k docs — hard SparkOutOfMemoryError
    # UNABLE_TO_ACQUIRE_MEMORY, measured — so that would test the floor,
    # not the spill path.) Shuffle partitions scale with the rung exactly
    # as in run_blocked (n/20k): the per-task MEMORY budget stays starved
    # (that is the gate), but per-task DATA must not grow with the corpus
    # — at 4M docs with the old fixed 4 partitions the signature hash-agg
    # hit AGGREGATE_OUT_OF_MEMORY before it could fall back to sort-spill
    # (measured); partitions are the production knob, the budget is not.
    try:
        n_docs_hint = int(docs_dir.rstrip("/").rsplit("_", 1)[-1])
    except ValueError:
        n_docs_hint = 250_000
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("scale-ladder-spill")
        .config("spark.driver.memory", "2g")
        .config("spark.memory.fraction", "0.2")
        # protect (almost) no storage: the operator PERSISTS its shingle
        # and signature tables (MEMORY_AND_DISK), and at the 4M rung those
        # blocks pin the default 0.5 storageFraction of the tiny pool —
        # execution can only evict down to the protected share, so the
        # signature partial-agg died AGGREGATE_OUT_OF_MEMORY (measured)
        # while 17 GB of evictable cache sat in the other half. 0.05
        # pushes cached blocks to disk under pressure — exactly the spill
        # path this gate exists to exercise.
        .config("spark.memory.storageFraction", "0.05")
        # the scan side needs the same treatment as the shuffle side: at
        # 4M docs a default 128 MB parquet split carries ~400k docs whose
        # signature partial-agg hash map alone (~150 MB) exceeds the
        # whole starved pool before the sort-fallback can engage
        # (AGGREGATE_OUT_OF_MEMORY, measured twice). Shrink splits so
        # per-task input — like per-task shuffle data — stays constant
        # as the corpus grows; both are standard starved-cluster tuning.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.shuffle.partitions", str(max(4, n_docs_hint // 20_000)))
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from devcontainers_etl_node_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    if block_key == "b100":
        docs = docs.withColumn("b100", _b100_col())
    t0 = time.perf_counter()
    # library default 32/8 — the shipped entry config since r11 (the r10
    # gate ran the then-shipped 16/4; both complete by spilling)
    n_pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, block_cols=[block_key] if block_key else None
    ).count()
    wall = round(time.perf_counter() - t0, 1)

    app_id = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    print(
        json.dumps(
            {
                "pairs": n_pairs,
                "wall_sec": wall,
                "memory_spilled_bytes": mem,
                "disk_spilled_bytes": disk,
            }
        )
    )


def run_bm25_index(sizes: list[int]) -> None:
    """BM25 BUILD+SERVE ladder: per rung, (a) build the persisted
    inverted index (the postings_index_sink body on the whole corpus as
    one batch — tokenize + partial-agg + bucket-partitioned write), then
    (b) serve a 3-query top-5 batch from it (partition-pruned read).
    The serve cost should track the QUERY TERMS' bucket sizes (Zipf head
    terms grow linearly with the corpus; the scan is 1/64th per distinct
    term), never the corpus tokenize."""
    from devcontainers_etl_node_spark.operators import retrieval
    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.streaming import postings_index_sink

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = [(1, ["w1", "w7"]), (2, ["w123", "w55"]), (3, ["w2000", "w3"])]
    print("| docs | index build | serve (3 queries, warm) | rows |")
    print("|---|---|---|---|")
    for n in sizes:
        d = os.path.join(ROOT, f"docs_v2_{n}")
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        idx = os.path.join(ROOT, f"bm25_idx_v2_{n}")
        shutil.rmtree(idx, ignore_errors=True)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        postings_index_sink(idx)(docs, 0)
        t_build = time.perf_counter() - t0
        serve_reps = []
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = retrieval.bm25_topk_from_index(spark, idx, queries, k=5).count()
            serve_reps.append(time.perf_counter() - t0)
        print(
            f"| {n} | {t_build:.2f} s | {min(serve_reps):.2f} s | {rows} |",
            flush=True,
        )


def run_streaming_state(sizes: list[int], batches: int = 10, modes: tuple = ("full", "slim")) -> None:
    """Streaming MinHash near-dup state-store rung (r10 verdict task 2):
    feed each rung's corpus through ``streaming_minhash_neardup_pairs``
    in ``batches`` event-time-ordered micro-batches spanning THREE
    watermark horizons, and read the state-operator metrics from every
    progress event.  The 100 TB claim under test: state is O(docs in
    horizon), not O(stream) — peak state rows must track the horizon's
    doc count (flat-ish per rung once the horizon fills, ~linear ACROSS
    rungs), and rows evicted (numRowsRemoved) must be > 0 once the
    watermark passes the first batches."""
    import shutil as _sh

    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    spark = get_spark()
    # r15: the inline slim verify is SHUFFLE_HASH-hinted (no broadcast
    # build), so spark.sql.broadcastTimeout is no longer a per-batch
    # deadline on the stateful stage — the rung runs at the DEFAULT
    # timeout on purpose: completing here under load is the fix's
    # done-criterion (the r14 run had to raise it to 3600 s to survive).
    print(f"# streaming-state start loadavg={os.getloadavg()[0]:.2f} batches={batches} broadcastTimeout={spark.conf.get('spark.sql.broadcastTimeout', '300')}")
    print("| docs | mode | horizon docs | peak state rows | peak state MB | KB/horizon-doc | rows removed | pairs | wall |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        d = os.path.join(ROOT, f"docs_v2_{n}")
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        # spread event time uniformly over 30 min; watermark horizon
        # 10 min => steady-state holds ~n/3 docs, ~2 horizons evict
        epoch_2024 = 1704067200  # 2024-01-01T00:00:00Z
        stamped = docs.select(
            F.col("doc_id"),
            F.col("text"),
            F.timestamp_seconds(
                F.lit(epoch_2024) + (F.col("doc_id") % 1800)
            ).alias("ts"),
        )
        src = os.path.join(ROOT, f"stream_src_{n}")
        _sh.rmtree(src, ignore_errors=True)
        # batch files ORDERED by event time so the watermark advances
        b = F.floor((F.col("doc_id") % 1800) / (1800 / batches)).cast("int")
        for i in range(batches):
            stamped.filter(b == i).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i:02d}")
            )
        # r12: both state modes per rung — full (shingle sets in state)
        # vs slim (sig+band keys only; verify joins the durable store).
        # r13: --streaming-slim runs slim only (the 500k rung's full-mode
        # state would be ~14 GB for no new information — the full-mode
        # curve is pinned at 5k/50k).
        for mode in modes:
            stream = spark.readStream.schema(stamped.schema).option(
                "maxFilesPerTrigger", "64"
            ).parquet(os.path.join(src, "b*"))
            store = (
                spark.read.parquet(os.path.join(src, "b*"))
                if mode == "slim"
                else None
            )
            out = streaming_minhash_neardup_pairs(
                stream, watermark="10 minutes", doc_store=store
            )
            ckpt = os.path.join(ROOT, f"stream_ck_{n}_{mode}")
            _sh.rmtree(ckpt, ignore_errors=True)
            t_start = time.perf_counter()
            q = (
                out.writeStream.format("memory")
                .queryName(f"mh_state_{n}_{mode}")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = round(time.perf_counter() - t_start, 1)
            peak_rows = peak_mem = removed = 0
            for p in q.recentProgress:
                for so in p.get("stateOperators") or []:
                    peak_rows = max(peak_rows, so.get("numRowsTotal", 0))
                    mem = so.get("stateMemory", so.get("memoryUsedBytes", 0)) or 0
                    cu = (so.get("customMetrics") or {}).get("stateOnCurrentVersionSizeBytes", 0)
                    peak_mem = max(peak_mem, mem, cu)
                    removed += so.get("numRowsRemoved", 0)
            pairs = spark.sql(
                f"SELECT count(*) c FROM mh_state_{n}_{mode}"
            ).collect()[0].c
            # horizon steady state: docs whose event time spans 10 of 30 min
            print(
                f"| {n} | {mode} | ~{n // 3} | {peak_rows} | {peak_mem / 1e6:.1f} | "
                f"{peak_mem / 1e3 / max(n // 3, 1):.1f} | "
                f"{removed} | {pairs} | {wall} s |",
                flush=True,
            )


def _b100_col():
    """~100-block FAMILY-CONSISTENT synthetic key: dup families are 4
    consecutive doc_ids (generators/synthetic.py:gen_documents_zipf), so
    hashing doc_id // 4 keeps every true near-dup pair inside one block —
    this key measures the floor division WITHOUT trading away recall,
    the production-shaped contract (lang/source/time-window keys are
    family-consistent on real corpora the same way)."""
    return _bn_col(100).alias("b100")


def run_slim_bucketed(
    store_sizes: list[int],
    stream_docs: int = 1000,
    batches: int = 10,
    fallback_max_rows: int | None = None,
) -> None:
    """Verify-scan prune rung (r12 verdict task 3 done-criterion): stream
    a FIXED small doc window (the first ``stream_docs`` ids of the rung
    corpus, in ``batches`` event-time micro-batches) against doc STORES
    10x apart, via slim_candidates + minhash_slim_verify_sink over a
    write_doc_store layout (buckets sized ~500 docs each). The 100 TB
    claim under test: verify-scan bytes track the micro-batch's CANDIDATE
    buckets, never the store — selected_bytes should stay ~flat while
    total store bytes grow 10x (sublinear ratio), with pair output
    identical to the inline stream-static slim verify.

    ``fallback_max_rows`` (r13 verdict task 3): re-run the SAME stream
    against the same store with the sink's ``max_candidate_rows`` forced
    below every batch's candidate count, proving the >threshold fallback
    is GRACEFUL — full-store scan per batch (selected == total) with a
    pair set identical to the pruned run, never an error or a silent
    truncation."""
    import shutil as _sh

    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.sinks import write_doc_store
    from devcontainers_etl_node_spark.streaming import (
        minhash_slim_verify_sink,
        streaming_minhash_neardup_pairs,
    )

    spark = get_spark()
    print(f"# slim-bucketed rung start loadavg={os.getloadavg()[0]:.2f}")
    print("| store docs | buckets | total store MB | mean selected MB/batch | selected/total | pairs | wall |")
    print("|---|---|---|---|---|---|---|")
    epoch_2024 = 1704067200
    for n in store_sizes:
        d = os.path.join(ROOT, f"docs_v2_{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            gen_documents(spark, n, d)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_buckets = max(16, n // 500)
        store_root = os.path.join(ROOT, f"doc_store_{n}")
        if not os.path.exists(os.path.join(store_root, "_STORE_MANIFEST.json")):
            write_doc_store(docs, store_root, n_buckets=n_buckets)
        # the streamed window: first stream_docs ids (their dup families
        # are id-consecutive, so candidates form within the window)
        stamped = docs.filter(F.col("doc_id") < stream_docs).select(
            "doc_id",
            "text",
            F.timestamp_seconds(
                F.lit(epoch_2024) + (F.col("doc_id") % 540)
            ).alias("ts"),
        )
        src = os.path.join(ROOT, f"slimb_src_{n}")
        _sh.rmtree(src, ignore_errors=True)
        # one FILE per micro-batch (coalesce(1) + maxFilesPerTrigger=1):
        # the prune story is per-micro-batch candidate volume ≪ buckets —
        # collapsing the window into one giant batch would select every
        # bucket and measure nothing
        b = F.floor((F.col("doc_id") % 540) / (540 / batches)).cast("int")
        for i in range(batches):
            stamped.filter(b == i).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i:02d}")
            )
        out_path = os.path.join(ROOT, f"slimb_pairs_{n}")
        ckpt = os.path.join(ROOT, f"slimb_ck_{n}")
        _sh.rmtree(out_path, ignore_errors=True)
        _sh.rmtree(ckpt, ignore_errors=True)
        sink = minhash_slim_verify_sink(store_root, out_path)
        stream = spark.readStream.schema(stamped.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(os.path.join(src, "b*"))
        cand = streaming_minhash_neardup_pairs(
            stream, watermark="10 minutes", slim_candidates=True
        )
        t0 = time.perf_counter()
        q = (
            cand.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 1)
        data = [m for m in sink.metrics if m["n_candidates"] > 0]
        # the sink records None byte fields on OSError — coalesce to 0
        # instead of letting a TypeError kill the rung mid-ladder
        tot = (data[0]["total_bytes"] or 0) if data else 0
        sel = sum((m["selected_bytes"] or 0) for m in data) / max(len(data), 1)
        pairs = spark.read.parquet(out_path).count() if data else 0
        print(
            f"| {n} | {n_buckets} | {tot / 1e6:.1f} | {sel / 1e6:.2f} | "
            f"{sel / max(tot, 1):.4f} | {pairs} | {wall} s |",
            flush=True,
        )
        print(f"  per-batch: {data}", flush=True)

        if fallback_max_rows is not None:
            # same stream, max_candidate_rows forced below every batch —
            # the fallback path must full-scan gracefully with identical pairs
            out_fb = os.path.join(ROOT, f"slimb_pairs_fb_{n}")
            ckpt_fb = os.path.join(ROOT, f"slimb_ck_fb_{n}")
            _sh.rmtree(out_fb, ignore_errors=True)
            _sh.rmtree(ckpt_fb, ignore_errors=True)
            sink_fb = minhash_slim_verify_sink(
                store_root, out_fb, max_candidate_rows=fallback_max_rows
            )
            stream_fb = spark.readStream.schema(stamped.schema).option(
                "maxFilesPerTrigger", "1"
            ).parquet(os.path.join(src, "b*"))
            cand_fb = streaming_minhash_neardup_pairs(
                stream_fb, watermark="10 minutes", slim_candidates=True
            )
            t0 = time.perf_counter()
            q = (
                cand_fb.writeStream.outputMode("append")
                .foreachBatch(sink_fb)
                .option("checkpointLocation", ckpt_fb)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall_fb = round(time.perf_counter() - t0, 1)
            data_fb = [m for m in sink_fb.metrics if m["n_candidates"] > 0]
            sel_fb = sum((m["selected_bytes"] or 0) for m in data_fb) / max(len(data_fb), 1)
            pruned = {
                (r.id_a, r.id_b, round(r.jaccard_sim, 9))
                for r in spark.read.parquet(out_path).collect()
            }
            full = {
                (r.id_a, r.id_b, round(r.jaccard_sim, 9))
                for r in spark.read.parquet(out_fb).collect()
            }
            assert full == pruned, (
                f"fallback pair set diverged: {len(full)} vs {len(pruned)}"
            )
            fell_back = [m for m in data_fb if m["n_buckets_selected"] == n_buckets]
            print(
                f"  fallback (max_candidate_rows={fallback_max_rows}): "
                f"{len(fell_back)}/{len(data_fb)} batches full-scanned, mean "
                f"selected {sel_fb / 1e6:.1f} MB/batch "
                f"(= store {tot / 1e6:.1f} MB), pairs identical "
                f"({len(full)}), wall {wall_fb} s",
                flush=True,
            )


def _bn_col(n_blocks: int):
    """Family-consistent synthetic key with ``n_blocks`` blocks — the
    generalization of :func:`_b100_col` (same doc_id//4 family hash)."""
    return F.pmod(F.xxhash64(F.floor(F.col("doc_id") / 4).cast("long")), F.lit(n_blocks))


def run_census(sizes: list[int], wall_top_key: str | None = "b1000") -> None:
    """Census-only rungs (r12 verdict task 2 follow-through): the Σ share²
    law is proven at 3 (lang) and ~100 blocks; the PRODUCTION claim
    ("crossover 10⁶ → 10⁹ under ~10³ blocks") is about ~10³ — this mode
    measures the EXACT band census (the cheap one-aggregation pre-flight,
    no operator wall needed) for lang / b100 / b1000 at each rung, pins
    the measured blocked/unblocked ratio against the predicted Σ share²
    floor share, and reports the kappa the unblocked census implies
    (``(2f / (b·n²))^(1/4)`` — the geometry model's calibration constant,
    0.047 on this corpus family since r11; drift would move every
    crossover the planner prints).

    ``wall_top_key``: additionally run the blocked OPERATOR wall at the
    TOP rung under that key (one rep cold + one warm) — the "one
    operator wall at the top rung" the r12 verdict asked for.
    """
    from pyspark import StorageLevel

    from devcontainers_etl_node_spark.operators import dedup
    from devcontainers_etl_node_spark.operators.skew import spread
    from devcontainers_etl_node_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"# census ladder start loadavg={os.getloadavg()[0]:.2f}")
    keys = (("lang", None), ("b100", 100), ("b1000", 1000))
    results: dict[int, dict] = {}
    for n in sizes:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // 20_000)))
        d = os.path.join(ROOT, f"docs_v2_{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            t0 = time.perf_counter()
            gen_documents(spark, n, d)
            print(f"  n={n:>9} corpus generated in {time.perf_counter() - t0:.0f} s", flush=True)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))

        sig = dedup.minhash_signature_table(
            dedup.shingle_hash_rows(
                spread(docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text")))
            ),
            32,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.perf_counter()
        n_docs = sig.count()
        t_sig = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        cen_un = dedup.minhash_candidate_census(dedup.banded_signatures(sig, 32, 8))
        t_census = round(time.perf_counter() - t0, 1)
        # implied kappa: f = b * n(n-1)/2 * kappa^r  (r=4, b=8)
        kappa = (
            2 * cen_un["raw_band_collisions"] / (8.0 * n_docs * (n_docs - 1))
        ) ** 0.25
        row: dict = {
            "unblocked_census": cen_un,
            "sig_sec": t_sig,
            "census_sec": t_census,
            "implied_kappa": round(kappa, 4),
        }
        print(
            f"  n={n:>9} unblocked census {cen_un['raw_band_collisions']:>14} "
            f"({cen_un['raw_band_collisions']/n_docs:.1f}/doc, max bucket "
            f"{cen_un['max_bucket']}) implied kappa {kappa:.4f} "
            f"[sig {t_sig}s census {t_census}s]",
            flush=True,
        )
        for key, nb in keys:
            keyed = (
                docs.select(F.col("doc_id").alias("_id"), F.col(key).alias("_k"))
                if nb is None
                else docs.select(F.col("doc_id").alias("_id"), _bn_col(nb).alias("_k"))
            )
            blk = keyed.select("_id", F.xxhash64(F.col("_k").cast("string")).alias("_blk"))
            cen = dedup.minhash_candidate_census(
                dedup.banded_signatures(sig.join(blk, "_id"), 32, 8, ("_blk",)),
                ("_blk",),
            )
            hist = [r["count"] for r in keyed.groupBy("_k").count().collect()]
            tot = sum(hist)
            pred = sum(c * (c - 1) for c in hist) / (tot * (tot - 1))
            ratio = cen["raw_band_collisions"] / max(cen_un["raw_band_collisions"], 1)
            row[key] = {
                "census": cen,
                "ratio": round(ratio, 5),
                "predicted_share2": round(pred, 5),
                "n_blocks": len(hist),
                "max_bucket": cen["max_bucket"],
            }
            print(
                f"  n={n:>9} census {key:<5}: {cen['raw_band_collisions']:>12} "
                f"(ratio {ratio:.5f} vs pred Σshare² {pred:.5f}, "
                f"{len(hist)} blocks, max bucket {cen['max_bucket']})",
                flush=True,
            )
        sig.unpersist()
        results[n] = row

    if wall_top_key:
        n = sizes[-1]
        d = os.path.join(ROOT, f"docs_v2_{n}")
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).withColumn(
            wall_top_key, _bn_col(int(wall_top_key.lstrip("b")))
        )
        reps = []
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            pairs = dedup.minhash_lsh_pairs(
                docs, threshold=0.5, block_cols=[wall_top_key]
            ).count()
            reps.append(round(time.perf_counter() - t0, 1))
            print(
                f"  n={n:>9} wall {wall_top_key}: {reps[-1]} s pairs={pairs} "
                f"load={os.getloadavg()[0]:.1f}",
                flush=True,
            )
        results[n][f"wall_{wall_top_key}"] = reps
        results[n][f"pairs_{wall_top_key}"] = pairs
    print(json.dumps({"sizes": sizes, "census": {str(k): v for k, v in results.items()}}))


def run_blocked(sizes: list[int], n_reps: int = 2) -> None:
    """Blocked-floor validation ladder (r12 verdict task 2): per rung,

    1. the EXACT band census (``dedup.minhash_candidate_census``, the
       r12 budget-gate aggregation) unblocked vs lang-blocked (3 blocks)
       vs b100-blocked (~100 family-consistent blocks), with the
       measured blocked/unblocked candidate ratio pinned against the
       predicted ``Σ share²`` computed from the exact block histogram —
       the r11 model hit twice at 3 blocks; this mode tests it at ~100
       blocks and at the next corpus decade;
    2. the BLOCKED operator walls (min of ``n_reps``) for per-decade
       scaling exponents — the production claim is that blocking makes
       the wall curve sub-linear where the unblocked r11 curve measured
       exponent ~2 past 10^5.7 docs;
    3. the census wall as a fraction of the blocked op wall (the r12
       budget gate's cost when enabled).

    The unblocked WALL is deliberately not re-run at the top rung —
    r11 measured 145 s at 1M and the exponent is known (~2); this mode
    measures the mitigation's curve, not the disease again."""
    from pyspark import StorageLevel

    from devcontainers_etl_node_spark.operators import dedup
    from devcontainers_etl_node_spark.operators.skew import spread
    from devcontainers_etl_node_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"# blocked ladder start loadavg={os.getloadavg()[0]:.2f} reps={n_reps}")

    results: dict[int, dict] = {}
    for n in sizes:
        # size shuffle partitions to the rung, as a production job would
        # (the session default 32 is right for the sf0.1 tests; at the 4M
        # rung the lang-blocked candidate join carries ~1.5e8 rows and 32
        # partitions put per-task hash/sort structures past the unified
        # pool — measured: UNABLE_TO_ACQUIRE_MEMORY at 4M/32, passes at
        # 4M/200. AQE coalesces the over-provisioned small rungs for free)
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // 20_000)))
        d = os.path.join(ROOT, f"docs_v2_{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            gen_documents(spark, n, d)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).withColumn(
            "b100", _b100_col()
        )

        # exact censuses over ONE persisted signature table (32/8 default)
        sig = dedup.minhash_signature_table(
            dedup.shingle_hash_rows(
                spread(
                    docs.select(
                        F.col("doc_id").alias("_id"), F.col("text").alias("_text")
                    )
                )
            ),
            32,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sig.count()
        t0 = time.perf_counter()
        cen_un = dedup.minhash_candidate_census(dedup.banded_signatures(sig, 32, 8))
        t_census = round(time.perf_counter() - t0, 2)
        row: dict = {"unblocked_census": cen_un, "census_sec": t_census}
        for key in ("lang", "b100"):
            blk = docs.select(
                F.col("doc_id").alias("_id"),
                F.xxhash64(
                    F.coalesce(F.col(key).cast("string"), F.lit("\x00null"))
                ).alias("_blk"),
            )
            cen = dedup.minhash_candidate_census(
                dedup.banded_signatures(sig.join(blk, "_id"), 32, 8, ("_blk",)),
                ("_blk",),
            )
            hist = [r["count"] for r in docs.groupBy(key).count().collect()]
            tot = sum(hist)
            pred = sum(c * (c - 1) for c in hist) / (tot * (tot - 1))
            row[key] = {
                "census": cen,
                "ratio": round(
                    cen["raw_band_collisions"]
                    / max(cen_un["raw_band_collisions"], 1),
                    4,
                ),
                "predicted_share2": round(pred, 4),
                "n_blocks": len(hist),
            }
            print(
                f"  n={n:>8} census {key:<5}: {cen['raw_band_collisions']:>12} "
                f"(ratio {row[key]['ratio']} vs pred Σshare² {pred:.4f}, "
                f"{len(hist)} blocks; unblocked {cen_un['raw_band_collisions']})",
                flush=True,
            )
        sig.unpersist()

        # blocked operator walls (+ pair counts: the family-consistent
        # b100 key should RETAIN the true pairs lang blocking drops)
        for key in ("lang", "b100"):
            reps, pairs = [], 0
            for _ in range(n_reps):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                pairs = dedup.minhash_lsh_pairs(
                    docs, threshold=0.5, block_cols=[key]
                ).count()
                reps.append(round(time.perf_counter() - t0, 1))
            row[f"wall_{key}"] = reps
            row[f"pairs_{key}"] = pairs
            print(
                f"  n={n:>8} wall {key:<5}: reps={reps} pairs={pairs} "
                f"census_frac={t_census / min(reps):.2f} "
                f"load={os.getloadavg()[0]:.1f}",
                flush=True,
            )
        results[n] = row

    print("\n| key | " + " | ".join(f"{n} docs" for n in sizes) + " | " +
          " | ".join(
              f"alpha {sizes[i]}->{sizes[i+1]}" for i in range(len(sizes) - 1)
          ) + " |")
    print("|---" * (len(sizes) + len(sizes)) + "|")
    for key in ("lang", "b100"):
        best = [min(results[n][f"wall_{key}"]) for n in sizes]
        alphas = [
            math.log(best[i + 1] / best[i]) / math.log(sizes[i + 1] / sizes[i])
            for i in range(len(sizes) - 1)
        ]
        print(
            f"| {key} | "
            + " | ".join(f"{b:.1f} s" for b in best)
            + " | "
            + " | ".join(f"{a:.2f}" for a in alphas)
            + " |"
        )
    print(json.dumps({"sizes": sizes, "blocked": {str(k): v for k, v in results.items()}}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--spill":
        block = None
        args = sys.argv[2:]
        if args and args[0] == "--block":
            block = args[1]
            args = args[2:]
        run_spill(args[0], block_key=block)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--blocked":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [25_000, 250_000, 2_500_000]
        )
        os.makedirs(ROOT, exist_ok=True)
        run_blocked(sizes)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--slim-bucketed":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [50_000, 500_000]
        )
        fb = int(sys.argv[3]) if len(sys.argv) > 3 else None
        os.makedirs(ROOT, exist_ok=True)
        run_slim_bucketed(sizes, fallback_max_rows=fb)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--wall":
        # blocked operator walls only (corpora must exist): --wall SIZES KEY
        sizes = [int(x) for x in sys.argv[2].split(",")]
        key = sys.argv[3] if len(sys.argv) > 3 else "b1000"
        from devcontainers_etl_node_spark.operators import dedup as _dd
        from devcontainers_etl_node_spark.session import get_spark as _gs

        spark = _gs()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        print(f"# wall start loadavg={os.getloadavg()[0]:.2f} key={key}")
        for n in sizes:
            spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // 20_000)))
            docs = spark.read.parquet(
                os.path.join(ROOT, f"docs_v2_{n}", "documents.parquet")
            ).withColumn(key, _bn_col(int(key.lstrip("b"))))
            for _ in range(2):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                pairs = _dd.minhash_lsh_pairs(docs, threshold=0.5, block_cols=[key]).count()
                print(
                    f"  n={n:>9} wall {key}: {round(time.perf_counter() - t0, 1)} s "
                    f"pairs={pairs} load={os.getloadavg()[0]:.1f}",
                    flush=True,
                )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--census":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [4_000_000, 10_000_000]
        )
        os.makedirs(ROOT, exist_ok=True)
        run_census(sizes, wall_top_key=sys.argv[3] if len(sys.argv) > 3 else "b1000")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bm25":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [5000, 50000, 250000]
        )
        run_bm25_index(sizes)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--streaming-slim":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [500_000]
        )
        os.makedirs(ROOT, exist_ok=True)
        run_streaming_state(sizes, modes=("slim",))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--streaming":
        sizes = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [5000, 50000]
        )
        os.makedirs(ROOT, exist_ok=True)
        run_streaming_state(sizes)
        return
    argv = sys.argv[1:]
    n_reps, entries = 2, None
    while argv and argv[0].startswith("--"):
        if argv[0] == "--reps":
            n_reps = int(argv[1])
            argv = argv[2:]
        elif argv[0] == "--entries":
            entries = argv[1].split(",")
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    sizes = [int(x) for x in argv[0].split(",")] if argv else [5000, 50000, 250000]
    os.makedirs(ROOT, exist_ok=True)
    run_ladder(sizes, n_reps=n_reps, entries=entries)


if __name__ == "__main__":
    main()
