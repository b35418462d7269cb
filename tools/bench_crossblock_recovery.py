"""Cross-block recovery recall/cost study (r11 verdict task 4).

On the 250k scale-ladder corpus, lang blocking measurably drops
legitimate cross-lang family pairs (r11: 35,792 -> 16,627) because the
synthetic dup families draw lang independently — the worst case for
blocking. This study measures what `minhash_crossblock_recovery` buys
back and what it costs:

1. unblocked pairs (the global-recall reference) + wall;
2. lang-blocked pairs + wall;
3. the recovery pass over the blocked output: n_reps, recovered pairs,
   wall;
4. recall of the DROPPED set: |recovered ∩ (unblocked − blocked)| /
   |unblocked − blocked|, plus pairs recovered beyond the unblocked
   LSH's own output (the rep pass can find pairs the direct pass's
   banding missed — both are exact-verified, so every emitted pair is
   true).

Usage:
    python tools/bench_crossblock_recovery.py [n_docs] [dup_fraction]
    # defaults 250000 0.10; dup_fraction 0.5 measures the HIGH-dup end,
    # where n_reps = #clusters << n and the rep pass gets cheap — the
    # favorable half of the cost contract.

Paste the table into PERF.md when it changes.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale_ladder import ROOT, gen_documents  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    dup = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10

    from devcontainers_etl_node_spark.operators import dedup
    from devcontainers_etl_node_spark.session import get_spark

    spark = get_spark()
    if dup == 0.10:
        d = os.path.join(ROOT, f"docs_v2_{n}")  # the shared ladder corpus
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            gen_documents(spark, n, d)
    else:
        from devcontainers_etl_node_spark.generators.synthetic import (
            gen_documents_zipf,
        )

        d = os.path.join(ROOT, f"docs_dup{int(dup * 100)}_{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            gen_documents_zipf(spark, n, dup_fraction=dup).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    print(
        f"# crossblock recovery study n={n} dup_fraction={dup} "
        f"loadavg={os.getloadavg()[0]:.2f}"
    )

    def timed(fn):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 1)

    unblocked_df, t_un = timed(lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5))
    unblocked = {(r.id_a, r.id_b) for r in unblocked_df.collect()}

    blocked_df, t_bl = timed(
        lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5, block_cols=["lang"])
    )
    blocked = {(r.id_a, r.id_b) for r in blocked_df.collect()}

    recovered_df, t_rec = timed(
        lambda: dedup.minhash_crossblock_recovery(docs, blocked_df, threshold=0.5)
    )
    recovered = {(r.id_a, r.id_b) for r in recovered_df.collect()}

    # n_reps = #components of the blocked pair graph + singletons
    from devcontainers_etl_node_spark.operators.graph import connected_components_star

    cc = connected_components_star(blocked_df)
    n_in_pairs = cc.count()
    n_clusters_multi = cc.select("component").distinct().count()
    n_reps = n - n_in_pairs + n_clusters_multi

    dropped = unblocked - blocked
    got_back = recovered & dropped
    beyond = recovered - dropped  # true pairs the direct unblocked LSH missed
    print(f"| corpus | unblocked | blocked (lang) | recovery pass | blocked+recovery |")
    print(f"|---|---|---|---|---|")
    print(
        f"| {n} docs | {len(unblocked)} pairs, {t_un} s "
        f"| {len(blocked)} pairs, {t_bl} s "
        f"| +{len(recovered)} pairs, {t_rec} s (n_reps {n_reps}) "
        f"| {len(blocked) + len(recovered)} pairs, {round(t_bl + t_rec, 1)} s |"
    )
    recall = len(got_back) / max(len(dropped), 1)
    print(
        f"dropped-by-blocking {len(dropped)}; recovered∩dropped {len(got_back)} "
        f"(recall {recall:.3f}); recovered beyond unblocked output {len(beyond)} "
        f"(all exact-verified); end loadavg={os.getloadavg()[0]:.2f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
