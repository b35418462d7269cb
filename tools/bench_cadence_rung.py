"""Composed production-cadence rung (r13 verdict task 2).

The individual dedup operators are laddered to 10M docs, but the COMPOSED
production step — transactional change feed → blocked + budget-gated +
persist_shingles incremental MinHash dedup — was pinned only at toy size
(tests/test_incremental.py:test_cdf_feed_production_cadence_blocked_gated_persisted).
This tool measures that composition at a real rung:

  1. corpus: gen_documents_zipf(n_hist + 2*n_batch) committed to a txlog
     table as v1 = history, v2/v3 = two ingest batches (append-only — the
     change-feed contract). Batches are MODULO-interleaved over doc_id
     (not range-sliced): the generator's dup families are the first 10%
     of ids, so interleaving makes families straddle history and batches
     — each ingest batch carries new×old AND new×new near-dups, the
     realistic shape the incremental verify stage exists for;
  2. step 1 = the snapshot build (whole history as one batch — the 4M
     UNABLE_TO_ACQUIRE_MEMORY configuration of PERF.md r12, now auto-sized
     by applied_partition_plan with NO manual conf);
  3. step 2 = one ingest batch through the full composition; wall +
     snapshot growth (sigs, shingle deltas, bytes/char of batch text);
  4. step 3 = the SAME batch shape, but the child process is SIGKILLed
     mid-run; the parent then resumes and asserts the write-ahead-intent
     cursor protocol at scale: the killed run advanced nothing, the
     resumed run processes the batch exactly once, and a 4th run reports
     no_new_data.

Defaults: 1,000,000 history / 100,000 per batch (the verdict's asked-for
rung). Paste the printed table into PERF.md.

``--bucketed N`` (r14): run the same composition on the bucketed store
layout (store_buckets=N) — O(batch) snapshot appends, candidate-bucket-
pruned verify, no corpus time travel. ``--steps-only`` skips the kill +
clean-twin phases (for the flatness-in-history comparison, where only
build + warm-step walls matter).

Usage:
    python tools/bench_cadence_rung.py [n_hist] [n_batch] [--bucketed N] [--steps-only]
    python tools/bench_cadence_rung.py --child ROOT WD BUCKETS  # internal (kill target)
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/scale_ladder"
BUDGET = 32.0  # funnel.DEFAULT_NEARDUP_BUDGET — the pipeline default


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _run_step(spark, root: str, wd: str, bucketed: int | None = None) -> dict:
    from devcontainers_etl_node_spark.incremental import (
        run_incremental_dedup_from_table,
    )

    kw = dict(
        block_cols=["lang", "source"],
        max_collisions_per_doc=BUDGET,
        persist_shingles=True,
    )
    if bucketed:
        kw["store_buckets"] = bucketed
    t0 = time.perf_counter()
    out = run_incremental_dedup_from_table(spark, root, wd, **kw)
    out["wall"] = round(time.perf_counter() - t0, 1)
    return out


def _child(root: str, wd: str, bucketed: int | None) -> int:
    """Kill target: run one cadence step, print nothing fancy."""
    from devcontainers_etl_node_spark.session import get_spark

    out = _run_step(get_spark(), root, wd, bucketed)
    print(f"child done v{out.get('version')} pairs={out.get('n_pairs')}")
    return 0


def main(n_hist: int, n_batch: int, bucketed: int | None = None, steps_only: bool = False) -> int:
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.generators.synthetic import gen_documents_zipf
    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.sinks import txlog

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    print(
        f"# cadence rung start n_hist={n_hist} n_batch={n_batch} "
        f"mode={'bucketed:' + str(bucketed) if bucketed else 'legacy'} "
        f"loadavg={os.getloadavg()[0]:.2f} shuffle_default="
        f"{spark.conf.get('spark.sql.shuffle.partitions')}"
    )

    n_total = n_hist + 2 * n_batch
    src = os.path.join(ROOT, f"docs_v2_{n_total}")
    if not os.path.exists(os.path.join(src, "documents.parquet", "_SUCCESS")):
        t0 = time.perf_counter()
        docs = gen_documents_zipf(spark, n_total)
        docs.repartition(max(1, n_total // 12_500)).write.mode("overwrite").parquet(
            os.path.join(src, "documents.parquet")
        )
        print(f"  corpus generated in {time.perf_counter() - t0:.0f} s", flush=True)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))

    tag = f"{n_total}_b{bucketed}" if bucketed else str(n_total)
    root = os.path.join(ROOT, f"cadence_corpus_{tag}")
    wd = os.path.join(ROOT, f"cadence_wd_{tag}")
    wd_clean = os.path.join(ROOT, f"cadence_wd_clean_{tag}")
    for p in (root, wd, wd_clean):
        shutil.rmtree(p, ignore_errors=True)

    # v1 = history, v2/v3 = ingest batches (append-only change feed),
    # modulo-interleaved so dup families straddle the splits (see module
    # docstring); k history shares + one share per batch
    k = n_hist // n_batch
    part = F.pmod(F.col("doc_id"), F.lit(k + 2))
    txlog.tx_write(docs.filter(part < k), root, mode="overwrite")
    steps = []

    # ---- step 1: snapshot build (whole history as one batch) ----
    out1 = _run_step(spark, root, wd, bucketed)
    steps.append(("build(1M hist)", n_hist, out1))
    print(
        f"  step1 build: wall {out1['wall']} s, v{out1['version']}, "
        f"{out1['n_pairs']} pairs", flush=True
    )
    if bucketed and os.environ.get("CADENCE_COMPACT"):
        # opt-in: compact the corpus-sized build delta into the
        # dir-partitioned base. Measured at 1M/4096: the prune then reads
        # 35% of store bytes but the 4096-small-file read overhead costs
        # more than it saves (step 18.1 -> 76.5 s) — dir-prune with
        # healthy >=64 MB bucket files is a >=100 GB-store feature, so at
        # sandbox scale the plain layout is the honest configuration.
        from devcontainers_etl_node_spark.incremental import compact_dedup_store

        t0 = time.perf_counter()
        c = compact_dedup_store(spark, wd)
        print(
            f"  compact: {time.perf_counter() - t0:.1f} s — folded "
            f"{c['folded_dirs']} dirs through v{c['compacted_through']} "
            f"({c['sig_files']} sig + {c['shingle_files']} shingle files)",
            flush=True,
        )

    # ---- step 2: one ingest batch through the composition ----
    txlog.tx_write(docs.filter(part == k), root, mode="append")
    out2 = _run_step(spark, root, wd, bucketed)
    steps.append(("batch", n_batch, out2))
    print(
        f"  step2 batch: wall {out2['wall']} s, v{out2['version']}, "
        f"{out2['n_pairs']} pairs", flush=True
    )
    if bucketed and out2.get("stats"):
        # verify-prune accounting: listing-level selected bytes — bucket
        # dirs of the compacted base count only when selected; plain
        # (post-compaction) deltas are scanned whole (row-skipped, but
        # their bytes are read)
        sel_buckets = set(out2["stats"]["cand_buckets"])
        sel = tot = 0
        for d in sorted(os.listdir(wd)):
            if not (d.startswith("shingles_b") or d.startswith("shingles_c")):
                continue
            entries = os.listdir(os.path.join(wd, d))
            if any(e.startswith("_bkt=") for e in entries):
                for entry in entries:
                    if not entry.startswith("_bkt="):
                        continue
                    b = _dir_bytes(os.path.join(wd, d, entry))
                    tot += b
                    if int(entry.split("=", 1)[1]) in sel_buckets:
                        sel += b
            else:
                b = _dir_bytes(os.path.join(wd, d))
                tot += b
                sel += b
        print(
            f"  verify prune: {len(sel_buckets)}/{bucketed} buckets selected, "
            f"{sel / 1e6:.1f}/{tot / 1e6:.1f} MB ({sel / max(tot, 1):.3f} of store)",
            flush=True,
        )

    # snapshot growth accounting (bucketed mode appends sig DELTAS, so v2
    # "size" is cumulative b1+b2 — the comparable on-disk footprint)
    if bucketed:
        # after the post-build compaction v1 lives in the compacted base
        base1 = os.path.join(wd, "sigs_c1")
        sig_bytes = {
            1: _dir_bytes(base1 if os.path.exists(base1) else os.path.join(wd, "sigs_b1"))
        }
        sig_bytes[2] = sig_bytes[1] + _dir_bytes(os.path.join(wd, "sigs_b2"))
    else:
        sig_bytes = {
            v: _dir_bytes(os.path.join(wd, f"sigs_v{v}")) for v in (1, 2)
        }
    shingle_bytes = {}
    for v in (1, 2):
        d = os.path.join(wd, f"shingles_c{v}")
        if not os.path.exists(d):
            d = os.path.join(wd, f"shingles_b{v}")
        shingle_bytes[v] = _dir_bytes(d)
    chars = docs.filter(part <= k).agg(F.sum(F.length("text"))).collect()[0][0]
    print(
        f"  snapshot: sigs v1 {sig_bytes[1]/1e6:.1f} MB -> v2 "
        f"{sig_bytes[2]/1e6:.1f} MB ({sig_bytes[2]/(n_hist+n_batch):.1f} B/doc); "
        f"shingle deltas b1 {shingle_bytes[1]/1e6:.1f} MB + b2 "
        f"{shingle_bytes[2]/1e6:.1f} MB "
        f"({(shingle_bytes[1]+shingle_bytes[2])/chars:.2f} B/char of corpus text)",
        flush=True,
    )

    if steps_only:
        print("\n| step | docs | wall s | pairs | version |")
        print("|---|---|---|---|---|")
        for name, nd, o in steps:
            print(f"| {name} | {nd} | {o['wall']} | {o['n_pairs']} | v{o['version']} |")
        return 0

    # ---- step 3: mid-run kill + resume (write-ahead-intent at scale) ----
    txlog.tx_write(docs.filter(part == k + 1), root, mode="append")
    cursor_before = json.load(open(os.path.join(wd, "CORPUS_CURSOR.json")))
    # the child pays ~20 s of JVM/session startup before the step begins;
    # aim the kill at the middle of the step proper
    kill_after = 25.0 + out2["wall"] * 0.5
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", root, wd, str(bucketed or 0)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    time.sleep(kill_after)
    child.send_signal(signal.SIGKILL)
    child.wait()
    # classify the crash point by on-disk state; the protocol's
    # exactly-once claim differs per side (incremental._run_from_cdf):
    current_mid = open(os.path.join(wd, "CURRENT")).read().strip()
    if current_mid == str(out2["version"]):
        # killed BEFORE the state commit: nothing advanced; the resumed
        # run must process the batch exactly once
        cursor_mid = json.load(open(os.path.join(wd, "CORPUS_CURSOR.json")))
        assert cursor_mid == cursor_before, "killed run advanced the cursor"
        print(
            f"  step3 kill: child SIGKILLed at {kill_after:.0f} s BEFORE "
            f"commit — cursor still {cursor_mid}, CURRENT still "
            f"v{current_mid}", flush=True
        )
        out3 = _run_step(spark, root, wd, bucketed)
        steps.append(("batch(resumed)", n_batch, out3))
        assert out3["version"] == out2["version"] + 1
    else:
        # killed AFTER the state commit (or the child outran the kill):
        # the batch is in; the resumed run must promote the intent and
        # no-op, never double-process
        assert current_mid == str(out2["version"] + 1)
        print(
            f"  step3 kill: child killed AFTER commit (CURRENT v{current_mid}) "
            f"— asserting the no-double-processing side", flush=True
        )
        out3 = _run_step(spark, root, wd, bucketed)
        assert out3.get("no_new_data"), "resume after committed kill must no-op"
        committed_pairs = spark.read.parquet(
            os.path.join(wd, "pairs", f"run_{current_mid}")
        ).count()
        out3 = {
            "version": int(current_mid),
            "n_pairs": committed_pairs,
            "wall": kill_after,
        }
        steps.append(("batch(child-committed)", n_batch, out3))
    out4 = _run_step(spark, root, wd, bucketed)
    assert out4.get("no_new_data"), "4th run must be a no-op"
    print(
        f"  step3 resume: wall {out3['wall']} s, v{out3['version']}, "
        f"{out3['n_pairs']} pairs; 4th run no_new_data={out4['no_new_data']}",
        flush=True,
    )

    # ---- clean twin of step 3's batch for pair-count parity ----
    # same history + batch through a FRESH workdir in two steps; the killed
    # +resumed run must emit the same pair count for its batch
    txlog_head = txlog.tx_head(root)
    r1 = _run_step(spark, root, wd_clean, bucketed)  # consumes v1..head in one gulp
    staged_total = out1["n_pairs"] + out2["n_pairs"] + out3["n_pairs"]
    print(
        f"  clean twin (whole corpus, one step): wall {r1['wall']} s, "
        f"{r1['n_pairs']} pairs vs staged total {staged_total} "
        f"(head v{txlog_head})", flush=True
    )
    assert r1["n_pairs"] == staged_total, (
        f"staged cadence diverged from the one-shot run: "
        f"{staged_total} vs {r1['n_pairs']}"
    )

    print("\n| step | docs | wall s | pairs | version |")
    print("|---|---|---|---|---|")
    for name, nd, o in steps:
        print(f"| {name} | {nd} | {o['wall']} | {o['n_pairs']} | v{o['version']} |")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        raise SystemExit(_child(sys.argv[2], sys.argv[3], int(sys.argv[4]) or None))
    argv = list(sys.argv[1:])
    bucketed = None
    if "--bucketed" in argv:
        i = argv.index("--bucketed")
        bucketed = int(float(argv[i + 1]))
        del argv[i : i + 2]
    steps_only = "--steps-only" in argv
    argv = [a for a in argv if a != "--steps-only"]
    nh = int(float(argv[0])) if argv else 1_000_000
    nb = int(float(argv[1])) if len(argv) > 1 else 100_000
    raise SystemExit(main(nh, nb, bucketed=bucketed, steps_only=steps_only))
