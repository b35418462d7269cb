"""Transactional manifest table (sinks/txlog.py): atomic visibility,
snapshot isolation / time travel, optimistic-concurrency rebase and
conflict, incremental change scans, compaction, vacuum — the ACID
surface the reference gets from Postgres/ClickHouse, rebuilt on
parquet + a versioned manifest."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.sinks import txlog


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("batch")
    )


def test_append_read_and_uncommitted_files_invisible(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = txlog.tx_write(_df(spark, 0, 10, "a"), root)
    assert v0 == 0 and txlog.tx_head(root) == 0
    assert txlog.tx_read(spark, root).count() == 10

    # a crashed writer: staged-but-never-committed files must be
    # invisible to every reader (the manifest IS the table)
    orphan = txlog._stage_files(_df(spark, 100, 200, "crash"), root)
    assert len(orphan) >= 1
    assert txlog.tx_read(spark, root).count() == 10

    # ... and vacuum reclaims them without touching referenced files
    deleted = txlog.tx_vacuum(root, keep_last=5)
    assert any(e["path"] in d or d in e["path"] for e in orphan for d in deleted)
    assert txlog.tx_read(spark, root).count() == 10


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)                   # v0
    pinned = txlog.tx_read(spark, root, version=0)                  # plan at v0
    txlog.tx_write(_df(spark, 10, 25, "b"), root)                   # v1 append
    txlog.tx_write(_df(spark, 0, 5, "c"), root, mode="overwrite")   # v2

    # the pinned plan still reads exactly v0's files
    assert pinned.count() == 10
    assert txlog.tx_read(spark, root, version=0).count() == 10
    assert txlog.tx_read(spark, root, version=1).count() == 25
    assert txlog.tx_read(spark, root).count() == 5
    tags = {r["batch"] for r in txlog.tx_read(spark, root).collect()}
    assert tags == {"c"}


def test_append_race_rebases_and_loses_nothing(spark, tmp_path):
    """Two appends racing for the same version: the loser must rebase
    onto the winner's head, so BOTH batches are in the final snapshot.
    The race is simulated by pre-publishing the other writer's manifest
    at the version our writer will try first."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)  # v0

    # "other writer" commits v1 out from under us: stage its files and
    # publish its manifest by hand
    other = txlog._stage_files(_df(spark, 10, 20, "other"), root)
    m0 = txlog._read_manifest(root, 0)
    assert txlog._try_commit(
        root,
        1,
        {
            "version": 1,
            "mode": "append",
            "operation": None,
            "added": [e["path"] for e in other],
            "files": m0["files"] + other,
            "committed_at": 0,
        },
    )

    v = txlog.tx_write(_df(spark, 20, 30, "mine"), root)  # races, rebases
    assert v == 2
    got = txlog.tx_read(spark, root)
    assert got.count() == 30
    assert {r["batch"] for r in got.collect()} == {"a", "other", "mine"}


def test_overwrite_with_stale_basis_conflicts(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)        # v0
    basis = txlog.tx_head(root)
    txlog.tx_write(_df(spark, 10, 20, "b"), root)       # v1: someone else
    with pytest.raises(txlog.TxConflict, match="based on v0 but head is v1"):
        txlog.tx_write(
            _df(spark, 0, 1, "mine"), root, mode="overwrite", expected_head=basis
        )
    # blind overwrite (unchecked basis) is allowed — truncate semantics
    v = txlog.tx_write(_df(spark, 0, 3, "trunc"), root, mode="overwrite")
    assert v == 2 and txlog.tx_read(spark, root).count() == 3


def test_changes_feed_returns_only_new_files(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)    # v0
    txlog.tx_write(_df(spark, 10, 18, "b"), root)   # v1
    txlog.tx_write(_df(spark, 18, 21, "c"), root)   # v2

    ch = txlog.tx_changes(spark, root, since_version=0)
    assert ch.count() == 11
    assert {r["batch"] for r in ch.collect()} == {"b", "c"}
    assert txlog.tx_changes(spark, root, since_version=2).count() == 0

    # an overwrite resets history: everything after it is "new"
    txlog.tx_write(_df(spark, 0, 4, "ow"), root, mode="overwrite")  # v3
    txlog.tx_write(_df(spark, 4, 6, "d"), root)                     # v4
    ch2 = txlog.tx_changes(spark, root, since_version=1)
    assert {r["batch"] for r in ch2.collect()} == {"ow", "d"}


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(3):
        txlog.tx_write(
            _df(spark, i * 50, (i + 1) * 50, f"b{i}").repartition(8), root
        )
    before = txlog._read_manifest(root, txlog.tx_head(root))["files"]
    assert len(before) >= 24
    v = txlog.tx_compact(spark, root)
    after = txlog._read_manifest(root, v)["files"]
    assert len(after) < len(before)
    got = txlog.tx_read(spark, root)
    assert got.count() == 150
    assert {r["batch"] for r in got.collect()} == {"b0", "b1", "b2"}
    # pre-compaction version still time-travels (until vacuum)
    assert txlog.tx_read(spark, root, version=v - 1).count() == 150


def test_vacuum_keeps_window_and_reclaims_the_rest(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").repartition(4), root)   # v0
    txlog.tx_write(_df(spark, 10, 20, "b"), root)                 # v1
    txlog.tx_compact(spark, root)                                 # v2
    deleted = txlog.tx_vacuum(root, keep_last=1)
    assert deleted  # v0/v1-only files + old manifests reclaimed
    assert txlog.tx_read(spark, root).count() == 20
    # outside the window: manifest gone
    with pytest.raises(FileNotFoundError):
        txlog.tx_read(spark, root, version=0)
    # no dangling references inside the window
    head = txlog.tx_head(root)
    for e in txlog._read_manifest(root, head)["files"]:
        assert os.path.exists(os.path.join(root, e["path"]))


def test_manifest_is_bounded_metadata_not_data(spark, tmp_path):
    """The 100 TB planning contract: the manifest is O(files) driver-side
    metadata (path + bytes), never row data."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 1000, "a"), root)
    (mpath,) = glob.glob(os.path.join(root, "_txlog", "*.json"))
    m = json.load(open(mpath))
    assert set(m) == {
        "version", "mode", "operation", "added", "files", "committed_at"
    }
    assert all(set(e) == {"path", "bytes"} for e in m["files"])
    assert os.path.getsize(mpath) < 4096
