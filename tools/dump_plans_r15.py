"""Dump .explain('formatted') for the fixed bench set into plans/r15/.

Usage: python tools/dump_plans_r15.py before|after [name ...]
Writes plans/r15/<query>_<stage>.txt for each requested entry (default:
every fixed bench entry).  Uses sf0.1 (the bench SF) so plan shapes match
what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from devcontainers_etl_node_spark.queries.catalog import QUERIES  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402

FIXED = [
    "pricing_summary", "star_enrich", "revenue_by_nation", "window_running",
    "topk_per_group", "sessionize", "events_hourly", "dedup_exact",
    "token_stats", "knn_cosine", "minhash_neardup", "asof_join",
    "curation_pipeline", "line_dedup", "dup_clusters", "ann_pq",
    "pretrain_prep", "contamination_threshold", "rolling_anomaly",
    "dataset_card", "unigram_doc_likelihood", "bm25_retrieval",
    "winnow_fingerprints", "url_canonical_dedup", "txlog_cdc_merge",
    "delta_export_roundtrip", "iceberg_export_roundtrip",
]


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or FIXED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR constructing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{stage}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
