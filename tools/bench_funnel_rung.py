"""Funnel 4M rung — the r13 verdict's task-1 done-criterion.

Runs ``funnel.run_staged_funnel`` (the real user entry point: same code
path as the ``curate`` CLI) over the scale-ladder corpus at the given
size, AT SESSION DEFAULTS — no manual ``spark.sql.shuffle.partitions`` /
``maxPartitionBytes`` conf. The r12 ladder measured this exact
configuration dying at 4M docs (``UNABLE_TO_ACQUIRE_MEMORY`` in the
blocked candidate join at the 32-partition default; double
``AGGREGATE_OUT_OF_MEMORY`` at default 128 MB scan splits); r14 wires
``minhash_partition_plan`` into the funnel's near-dedup stage
(``applied_partition_plan``, sized from the exact-dedup stage's txlog
manifest), so the same run must now pass with zero caller conf.

Prints per-stage commit walls (timed around ``txlog.tx_write``), the
geometry the plan applied, and the funnel report. Session conf is
asserted unchanged after the run (scoped restore).

Usage:
    python tools/bench_funnel_rung.py [n]      # default 4,000,000
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/scale_ladder"


def main(n: int) -> int:
    from devcontainers_etl_node_spark import funnel
    from devcontainers_etl_node_spark.generators.synthetic import gen_documents_zipf
    from devcontainers_etl_node_spark.operators.dedup import minhash_partition_plan
    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.sinks import txlog

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    shuffle0 = spark.conf.get("spark.sql.shuffle.partitions")
    split0 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    print(
        f"# funnel rung n={n} loadavg={os.getloadavg()[0]:.2f} "
        f"session defaults: shuffle={shuffle0} split={split0} (NO manual conf)"
    )

    d = os.path.join(ROOT, f"docs_v2_{n}")
    if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
        t0 = time.perf_counter()
        docs = gen_documents_zipf(spark, n)
        docs.repartition(max(1, n // 12_500)).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        print(f"  corpus generated in {time.perf_counter() - t0:.0f} s", flush=True)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))

    wd = os.path.join(ROOT, f"funnel_wd_{n}")
    shutil.rmtree(wd, ignore_errors=True)

    # time each stage at its commit point (tx_write is the stage wall)
    walls: dict[str, float] = {}
    real_write = txlog.tx_write

    def timed_write(df, path, **kw):
        t0 = time.perf_counter()
        out = real_write(df, path, **kw)
        walls[kw.get("operation", path)] = round(time.perf_counter() - t0, 1)
        return out

    txlog.tx_write = timed_write
    try:
        t0 = time.perf_counter()
        out = funnel.run_staged_funnel(spark, docs, wd)
        total = round(time.perf_counter() - t0, 1)
    finally:
        txlog.tx_write = real_write

    assert spark.conf.get("spark.sql.shuffle.partitions") == shuffle0
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == split0
    stats = txlog.tx_stats(os.path.join(wd, "02_exact_dedup"))
    plan = minhash_partition_plan(
        stats["rows"], avg_doc_bytes=stats["bytes"] // max(stats["rows"], 1)
    )
    print(
        f"  geometry applied to near_dedup: n_exact={stats['rows']} -> "
        f"shuffle_partitions={plan['shuffle_partitions']}, "
        f"maxPartitionBytes={plan['max_partition_bytes']} "
        f"(session restored to {shuffle0}/{split0})", flush=True
    )
    print(f"  computed: {out['computed']}  total wall {total} s")
    print("\n| stage | commit wall s |")
    print("|---|---|")
    for op, w in walls.items():
        print(f"| {op} | {w} |")
    print()
    out["report"].show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000))
