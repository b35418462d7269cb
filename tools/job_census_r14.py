"""Job/stage census for bench entries (r14 optimization evidence).

Two noise-robust structural metrics this host's wild wall-clock variance
cannot fake (NOTES.md r13 host-band protocol):

- ``jobs <entry> [...]``: Spark jobs per warm entry call, counted with a
  job group — sequential-action fragmentation shows up here regardless
  of load.
- ``stages <entry>``: per-stage numTasks + numCompletedTasks for one warm
  call. A stage listed by several jobs but with completed==0 was SKIPPED
  (ReusedExchange / shuffle reuse) — this is how the one-DAG
  minhash_neardup claim "only two corpus-sized stages execute" was
  verified (28 listed stages, exactly two 32-task stages with
  completed>0: the signature build and the candidate-only verify
  re-shingle).

Usage: python tools/job_census_r14.py jobs|stages <entry> [entry ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devcontainers_etl_node_spark.queries.catalog import QUERIES  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402

SMALL = {
    "pricing_summary", "revenue_by_nation", "topk_per_group", "knn_cosine",
    "dup_clusters", "ann_pq", "pretrain_prep",
}


def run_once(spark, name: str, sf: str, group: str | None) -> float:
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    if group:
        spark.sparkContext.setJobGroup(group, name)
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf)
    if name in SMALL:
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    st = spark.sparkContext.statusTracker()
    for name in names:
        run_once(spark, name, sf, None)  # warm
        g = f"census_{name}"
        w = run_once(spark, name, sf, g)
        ids = sorted(st.getJobIdsForGroup(g))
        if mode == "jobs":
            print(f"{name}: warm wall={w:.2f}s jobs={len(ids)} load={os.getloadavg()[0]:.2f}")
            continue
        seen: dict[int, tuple[int, int]] = {}
        refs = 0
        for jid in ids:
            ji = st.getJobInfo(jid)
            refs += len(ji.stageIds)
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si:
                    seen[sid] = (si.numTasks, si.numCompletedTasks)
        executed = {s: v for s, v in seen.items() if v[1] > 0}
        big = {s: v for s, v in executed.items() if v[0] >= 16}
        print(
            f"{name}: warm wall={w:.2f}s jobs={len(ids)} stage_refs={refs} "
            f"unique={len(seen)} executed={len(executed)} corpus-sized(>=16 tasks)={len(big)}"
        )
        for sid, (nt, nc) in sorted(seen.items()):
            tag = "EXEC" if nc > 0 else "skip"
            print(f"  stage {sid}: tasks={nt} completed={nc} [{tag}]")


if __name__ == "__main__":
    main()
