"""Staged restartable funnel: parity with pretrain_prep + resume semantics."""

from __future__ import annotations

import os
import shutil

from devcontainers_etl_node_spark import funnel
from devcontainers_etl_node_spark.queries.catalog import QUERIES, table
from tests.conftest import SF_SMALL


def _report_rows(df):
    return sorted(
        (r.stage_no, r.stage, r.docs, r.tokens) for r in df.collect()
    )


def _parquet_mtimes(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }


def test_staged_funnel_matches_pretrain_prep(spark, tmp_path):
    docs = table(spark, SF_SMALL, "documents")
    out = funnel.run_staged_funnel(spark, docs, str(tmp_path))
    assert out["computed"] == list(funnel.STAGES)  # cold run computes all
    staged = _report_rows(out["report"])
    single_dag = _report_rows(QUERIES["pretrain_prep"](spark, SF_SMALL))
    assert staged == single_dag


def test_staged_funnel_resumes_from_completed_stages(spark, tmp_path):
    docs = table(spark, SF_SMALL, "documents")
    first = funnel.run_staged_funnel(spark, docs, str(tmp_path))
    baseline = _report_rows(first["report"])

    stage1 = funnel._stage_dir(str(tmp_path), 1, "quality_gate")
    mtimes_before = _parquet_mtimes(stage1)

    # lose the last stage (simulated crash before it committed)
    shutil.rmtree(funnel._stage_dir(str(tmp_path), 5, "packed"))
    second = funnel.run_staged_funnel(spark, docs, str(tmp_path))
    assert second["computed"] == ["packed"]  # only the lost stage reran
    assert _parquet_mtimes(stage1) == mtimes_before  # stage 1 untouched
    assert _report_rows(second["report"]) == baseline


def test_staged_funnel_recomputes_downstream_of_stale_stage(spark, tmp_path):
    docs = table(spark, SF_SMALL, "documents")
    funnel.run_staged_funnel(spark, docs, str(tmp_path))

    # stage 2 lost its commit marker → it AND everything after must rerun,
    # even though stages 3-5 still have complete outputs on disk
    os.remove(os.path.join(funnel._stage_dir(str(tmp_path), 2, "exact_dedup"), "_SUCCESS"))
    rerun = funnel.run_staged_funnel(spark, docs, str(tmp_path))
    assert rerun["computed"] == ["exact_dedup", "near_dedup", "decontaminated", "packed"]


def test_staged_funnel_invalidates_on_changed_params(spark, tmp_path):
    """Changed max_tokens must invalidate the packed stage (its manifest
    records the parameter) instead of silently reusing stale output."""
    docs = table(spark, SF_SMALL, "documents")
    funnel.run_staged_funnel(spark, docs, str(tmp_path), max_tokens=512)
    rerun = funnel.run_staged_funnel(spark, docs, str(tmp_path), max_tokens=256)
    assert rerun["computed"] == ["packed"]  # only the parameter-bearing stage
    # and re-running with the original params again recomputes again (the
    # manifest now records 256)
    third = funnel.run_staged_funnel(spark, docs, str(tmp_path), max_tokens=512)
    assert third["computed"] == ["packed"]


def test_staged_funnel_invalidates_on_changed_input(spark, tmp_path):
    """A different input corpus (different fingerprint) invalidates every
    stage — a resumed run can never mix corpora."""
    docs = table(spark, SF_SMALL, "documents")
    funnel.run_staged_funnel(spark, docs, str(tmp_path))
    halved = docs.filter("doc_id % 2 = 0")
    rerun = funnel.run_staged_funnel(spark, halved, str(tmp_path))
    assert rerun["computed"] == list(funnel.STAGES)
    # explicit fingerprints drive the same mechanism (production snapshot ids)
    rerun2 = funnel.run_staged_funnel(
        spark, halved, str(tmp_path), input_fingerprint="snapshot-v2"
    )
    assert rerun2["computed"] == list(funnel.STAGES)
    rerun3 = funnel.run_staged_funnel(
        spark, halved, str(tmp_path), input_fingerprint="snapshot-v2"
    )
    assert rerun3["computed"] == []
