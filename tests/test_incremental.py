"""Snapshot-backed incremental dedup: first run == batch, second run
pays only for the new batch, parameters are a contract, commits are
crash-ordered (snapshot fully written before the pointer moves)."""

from __future__ import annotations

import os

import pytest

from devcontainers_etl_node_spark.incremental import run_incremental_dedup
from devcontainers_etl_node_spark.operators import dedup


BASE = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"


def _corpus_a(spark):
    rows = [(1, BASE), (2, BASE.replace("lazy", "sleepy"))] + [
        (10 + i, f"historical filler number {i} with distinct vocabulary items {i * 31}")
        for i in range(8)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _corpus_b(spark):
    rows = [
        (101, BASE.replace("tonight", "today")),
        (102, "fresh arrival text that is almost a twin of the next document body here"),
        (103, "fresh arrival text that is almost a twin of the next document body there"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_run_equals_batch_then_incremental_pays_only_for_new(spark, tmp_path):
    wd = str(tmp_path / "dedup_snap")
    a, b = _corpus_a(spark), _corpus_b(spark)

    r1 = run_incremental_dedup(spark, a, wd)
    got1 = {(r.id_a, r.id_b) for r in r1["pairs"].collect()}
    batch_a = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(a, threshold=0.5).collect()}
    assert got1 == batch_a and (1, 2) in got1
    assert r1["version"] == 1

    r2 = run_incremental_dedup(spark, b, wd, old_docs=a)
    got2 = {(r.id_a, r.id_b) for r in r2["pairs"].collect()}
    full = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(a.unionByName(b), threshold=0.5).collect()
    }
    new_ids = {101, 102, 103}
    assert got2 == {(x, y) for x, y in full if x in new_ids or y in new_ids}
    assert (1, 2) not in got2  # history never re-pays
    assert r2["version"] == 2

    # committed snapshot == from-scratch rebuild over the union
    snap = spark.read.parquet(os.path.join(wd, "sigs_v2"))
    rebuilt = dedup.minhash_signature_table(
        dedup.shingle_hash_rows(
            a.unionByName(b).selectExpr("doc_id as _id", "text as _text")
        )
    )
    assert {r._id: list(r._sig) for r in snap.collect()} == {
        r._id: list(r._sig) for r in rebuilt.collect()
    }
    # pair history = union of per-run outputs
    hist = spark.read.parquet(os.path.join(wd, "pairs", "run_1")).unionByName(
        spark.read.parquet(os.path.join(wd, "pairs", "run_2"))
    )
    assert {(r.id_a, r.id_b) for r in hist.collect()} == full
    # v1 snapshot still intact (versioned, not overwritten)
    assert os.path.exists(os.path.join(wd, "sigs_v1", "_SUCCESS"))


def test_parameter_mismatch_fails_loudly(spark, tmp_path):
    wd = str(tmp_path / "dedup_snap2")
    a = _corpus_a(spark)
    run_incremental_dedup(spark, a, wd, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="was built with"):
        run_incremental_dedup(spark, _corpus_b(spark), wd, old_docs=a, num_hashes=32, bands=8)


def test_old_docs_required_once_snapshot_exists(spark, tmp_path):
    wd = str(tmp_path / "dedup_snap3")
    a = _corpus_a(spark)
    run_incremental_dedup(spark, a, wd)
    with pytest.raises(ValueError, match="old_docs"):
        run_incremental_dedup(spark, _corpus_b(spark), wd)


def test_corrupt_current_pointer_fails_loudly(spark, tmp_path):
    """A CURRENT file that exists but doesn't parse is corruption, not
    'no snapshot' — silently restarting at v1 would overwrite sigs_v1 and
    dedup the batch against empty history (ADVICE r4)."""
    wd = str(tmp_path / "dedup_snap4")
    a = _corpus_a(spark)
    run_incremental_dedup(spark, a, wd)
    with open(os.path.join(wd, "CURRENT"), "w") as f:
        f.write("not-a-version")
    with pytest.raises(ValueError, match="corrupt"):
        run_incremental_dedup(spark, _corpus_b(spark), wd, old_docs=a)
    # sigs_v1 untouched by the failed run
    assert os.path.exists(os.path.join(wd, "sigs_v1", "_SUCCESS"))


def test_resubmitted_batch_rejected(spark, tmp_path):
    """Committing the same batch twice would merge duplicate _id signature
    rows into the snapshot and inflate every later run (ADVICE r4) — the
    overlap gate raises before any state is written."""
    wd = str(tmp_path / "dedup_snap5")
    a, b = _corpus_a(spark), _corpus_b(spark)
    run_incremental_dedup(spark, a, wd)
    run_incremental_dedup(spark, b, wd, old_docs=a)
    with pytest.raises(ValueError, match="already present"):
        run_incremental_dedup(spark, b, wd, old_docs=a.unionByName(b))
    # the failed run committed nothing: pointer still v2, no v3 snapshot
    with open(os.path.join(wd, "CURRENT")) as f:
        assert f.read().strip() == "2"
    assert not os.path.exists(os.path.join(wd, "sigs_v3"))
