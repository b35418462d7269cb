"""Targeted per-entry bench for the r14 optimization round.

Same methodology as bench.py (warmup, gc+System.gc between reps, min of
reps, noop sink / collect for small outputs) but over a named subset, so
before/after numbers for one optimization don't need a full bench run.

Usage: python tools/minibench_r14.py <label> <entry> [entry ...]
Appends one JSON line to /root/repo/plans/r14/minibench.jsonl.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devcontainers_etl_node_spark.queries.catalog import QUERIES  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402

SMALL_OUTPUT = {
    "pricing_summary", "revenue_by_nation", "topk_per_group", "knn_cosine",
    "dup_clusters", "ann_pq", "pretrain_prep",
}


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["row_counts"](spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]

        def one_rep() -> float:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in SMALL_OUTPUT:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        reps = [one_rep() for _ in range(3)]
        if min(reps) < 2.0:
            reps += [one_rep() for _ in range(2)]
        out[name] = {
            "best": round(min(reps), 4),
            "reps": [round(t, 4) for t in reps],
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(f"{name}: best={out[name]['best']} reps={out[name]['reps']} load={out[name]['loadavg']}")

    line = json.dumps({"label": label, "ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "entries": out})
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14", "minibench.jsonl")
    with open(path, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
