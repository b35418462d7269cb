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
    # (retention 0: this test IS the no-writer-in-flight case)
    deleted = txlog.tx_vacuum(root, keep_last=5, retention_hours=0)
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
    deleted = txlog.tx_vacuum(root, keep_last=1, retention_hours=0)
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
    metadata (path + bytes + footer row count), never row data."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 1000, "a"), root)
    (mpath,) = glob.glob(os.path.join(root, "_txlog", "*.json"))
    m = json.load(open(mpath))
    assert set(m) == {
        "version", "mode", "operation", "added", "files", "schema",
        "committed_at", "txns",
    }
    assert m["schema"] == {"id": "bigint", "batch": "string"}
    assert all(set(e) <= {"path", "bytes", "rows", "stats"} for e in m["files"])
    # rows + zone maps come from parquet footers, not a scan — and exact
    assert sum(e["rows"] for e in m["files"]) == 1000
    lo = min(e["stats"]["id"][0] for e in m["files"] if "stats" in e)
    hi = max(e["stats"]["id"][1] for e in m["files"] if "stats" in e)
    assert (lo, hi) == (0, 999)
    # string columns carry NO stats (parquet may truncate string min/max,
    # which would make pruning unsound)
    assert all("batch" not in e.get("stats", {}) for e in m["files"])
    assert os.path.getsize(mpath) < 8192


def test_data_skipping_prunes_files_and_stays_exact(spark, tmp_path):
    """Zone-map file skipping: three appended batches with disjoint id
    ranges; a range read plans ONLY the intersecting file(s) from the
    manifest (driver-side arithmetic, no footer reads) and returns
    exactly what a full-scan filter returns."""
    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        txlog.tx_write(_df(spark, lo, lo + 100, "b").coalesce(1), root)
    all_files = txlog.tx_prune_files(root, "id")
    assert len(all_files) == 3
    pruned = txlog.tx_prune_files(root, "id", 150, 160)
    assert len(pruned) == 1
    got = sorted(r.id for r in txlog.tx_read_pruned(spark, root, "id", 150, 160).collect())
    assert got == list(range(150, 161))
    # open-ended bounds work too
    assert len(txlog.tx_prune_files(root, "id", lo=250)) == 1
    assert len(txlog.tx_prune_files(root, "id", hi=50)) == 1
    # a column with no stats (string) never prunes — sound, not heuristic
    assert len(txlog.tx_prune_files(root, "batch", 0, 1)) == 3
    # empty intersection -> empty result, schema intact
    empty = txlog.tx_read_pruned(spark, root, "id", 1000, 2000)
    assert empty.count() == 0 and set(empty.columns) == {"id", "batch"}


def test_clustered_compaction_makes_point_queries_plan_one_file(spark, tmp_path):
    """tx_compact(cluster_by): interleaved writes give every file a
    full-width id zone map (skipping useless); range-clustered
    compaction narrows each file's range so a point query plans 1 file."""
    root = str(tmp_path / "t")
    for start in range(4):  # stride-interleaved: every file spans ~0..400
        txlog.tx_write(
            _df(spark, 0, 100, "x")
            .select((F.col("id") * 4 + start).alias("id"), "batch")
            .coalesce(1),
            root,
        )
    before = txlog.tx_prune_files(root, "id", 42, 42)
    assert len(before) == 4  # no skipping possible pre-compaction
    txlog.tx_compact(spark, root, target_file_bytes=1024, cluster_by=["id"])
    files = txlog.tx_prune_files(root, "id")
    after = txlog.tx_prune_files(root, "id", 42, 42)
    assert len(files) >= 2 and len(after) == 1
    got = txlog.tx_read_pruned(spark, root, "id", 42, 42).collect()
    assert [r.id for r in got] == [42]


def test_idempotent_write_lands_each_batch_exactly_once(spark, tmp_path):
    """tx_write_idempotent: the Delta txnAppId/txnVersion protocol — a
    replayed (app_id, batch_id) is skipped, distinct apps are
    independent, and the data reflects each batch exactly once."""
    root = str(tmp_path / "t")
    assert txlog.tx_write_idempotent(_df(spark, 0, 10, "b0"), root, "appA", 0) == 0
    # replay of batch 0 (crash-recovery path): skipped
    assert txlog.tx_write_idempotent(_df(spark, 0, 10, "b0"), root, "appA", 0) is None
    assert txlog.tx_read(spark, root).count() == 10
    # next batch commits; an OLD batch id after it is also skipped
    assert txlog.tx_write_idempotent(_df(spark, 10, 15, "b1"), root, "appA", 1) == 1
    assert txlog.tx_write_idempotent(_df(spark, 99, 100, "x"), root, "appA", 0) is None
    # a different app's batch 0 is its own sequence
    assert txlog.tx_write_idempotent(_df(spark, 15, 18, "c0"), root, "appB", 0) == 2
    assert txlog.tx_read(spark, root).count() == 18
    assert txlog.tx_txn_version(root, "appA") == 1
    assert txlog.tx_txn_version(root, "appB") == 0
    assert txlog.tx_txn_version(root, "appC") == -1


def test_commit_is_crash_atomic_and_leaves_no_temps(spark, tmp_path):
    """A manifest can never be observed truncated: the publish is a
    hardlink of an fsynced temp. Simulate the crash-mid-write case (a
    stranded ``.inprogress.*`` temp) and verify it is invisible to
    tx_head/readers and does not block the next committer; verify no
    temps survive a successful commit either."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)  # v0
    log_dir = os.path.join(root, "_txlog")
    # crashed writer: truncated JSON under a temp name for the NEXT version
    stranded = os.path.join(log_dir, "v000000000001.json.inprogress.deadbeef")
    with open(stranded, "w") as f:
        f.write('{"version": 1, "files": [')  # torn write
    assert txlog.tx_head(root) == 0            # temp is not a version
    assert txlog.tx_read(spark, root).count() == 10
    v = txlog.tx_write(_df(spark, 10, 15, "b"), root)  # commits v1 fine
    assert v == 1 and txlog.tx_read(spark, root).count() == 15
    # the winning manifest is complete, parseable JSON
    m = txlog._read_manifest(root, 1)
    assert m["version"] == 1
    # successful commits leave no temps of their own behind
    temps = [p for p in os.listdir(log_dir) if ".inprogress." in p]
    assert temps == [os.path.basename(stranded)]


def test_commit_loser_cleans_temp_and_returns_false(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)  # v0 exists
    m0 = txlog._read_manifest(root, 0)
    assert txlog._try_commit(root, 0, m0) is False  # loses to itself
    log_dir = os.path.join(root, "_txlog")
    assert [p for p in os.listdir(log_dir) if ".inprogress." in p] == []


def test_vacuum_grace_window_protects_inflight_writers(spark, tmp_path):
    """Delta's retention rule: an unreferenced-but-RECENT file may belong
    to a writer between stage and commit — default vacuum must not touch
    it, so that writer's later commit still references live files."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)  # v0
    # an in-flight writer has staged but not yet committed
    staged = txlog._stage_files(_df(spark, 10, 20, "inflight"), root)
    deleted = txlog.tx_vacuum(root, keep_last=1)  # default retention
    assert deleted == []  # fresh orphans survive
    # the in-flight writer now commits by hand — its files must be live
    m0 = txlog._read_manifest(root, 0)
    assert txlog._try_commit(
        root, 1,
        {"version": 1, "mode": "append", "operation": None,
         "added": [e["path"] for e in staged],
         "files": m0["files"] + staged, "committed_at": 0},
    )
    got = txlog.tx_read(spark, root)
    assert got.count() == 20
    assert {r["batch"] for r in got.collect()} == {"a", "inflight"}


def test_changes_after_vacuum_raises_descriptive_error(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)   # v0
    txlog.tx_write(_df(spark, 10, 20, "b"), root)  # v1
    txlog.tx_write(_df(spark, 20, 30, "c"), root)  # v2
    txlog.tx_vacuum(root, keep_last=1, retention_hours=0)  # drops v0, v1
    with pytest.raises(ValueError, match="vacuumed.*full snapshot"):
        txlog.tx_changes(spark, root, since_version=0)
    # within the retained window the feed still works
    assert txlog.tx_changes(spark, root, since_version=2).count() == 0


def test_append_schema_drift_rejected_and_evolution_explicit(spark, tmp_path):
    """Schema contract: a drifted append is rejected loudly (a
    mixed-schema parquet scan silently takes one file's schema);
    explicit evolution flips the snapshot to mergeSchema planning so
    old files surface the new column as NULL; overwrite resets both the
    schema and the evolved flag."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)  # v0: (id, batch)

    wider = _df(spark, 10, 15, "b").withColumn("score", F.lit(1.5))
    with pytest.raises(ValueError, match="schema.*differs"):
        txlog.tx_write(wider, root)
    assert txlog.tx_head(root) == 0  # nothing committed

    v = txlog.tx_write(wider, root, allow_schema_change=True)
    assert v == 1
    got = txlog.tx_read(spark, root)
    assert set(got.columns) == {"id", "batch", "score"}
    rows = {r.id: r.score for r in got.collect()}
    assert rows[0] is None and rows[12] == 1.5  # old files read NULL
    # evolution is sticky: the NEXT append (new schema) still needs
    # mergeSchema because v0's files lack the column
    txlog.tx_write(wider.withColumn("id", F.col("id") + 90), root)
    assert txlog._read_manifest(root, 2).get("schema_evolved") is True
    assert txlog.tx_read(spark, root).count() == 20
    # a full rewrite homogenizes files and drops the flag
    txlog.tx_compact(spark, root)
    head = txlog.tx_head(root)
    assert txlog._read_manifest(root, head).get("schema_evolved") is None
    assert txlog.tx_read(spark, root).count() == 20
    # evolution can also DROP a column: reads follow the committed
    # schema, not the union of whatever the scanned files contain
    narrow = spark.range(200, 205).select(F.col("id"), F.lit(9.9).alias("score"))
    txlog.tx_write(narrow, root, allow_schema_change=True)
    got2 = txlog.tx_read(spark, root)
    assert set(got2.columns) == {"id", "score"}
    assert got2.count() == 25


def test_pruned_read_respects_schema_evolution(spark, tmp_path):
    """A pruned read over an EVOLVED snapshot must merge file schemas:
    without it, a subset scan silently takes one file's schema and the
    evolved column vanishes (or resolves against the wrong file)."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 100, "a").coalesce(1), root)
    wider = (
        _df(spark, 100, 200, "b").withColumn("score", F.lit(2.0)).coalesce(1)
    )
    txlog.tx_write(wider, root, allow_schema_change=True)
    # a range spanning BOTH files: evolved column present, NULL for old
    got = txlog.tx_read_pruned(spark, root, "id", 50, 150)
    assert set(got.columns) == {"id", "batch", "score"}
    rows = {r.id: r.score for r in got.collect()}
    assert len(rows) == 101 and rows[50] is None and rows[150] == 2.0
    # a range hitting ONLY the old file still surfaces the new column
    old_only = txlog.tx_read_pruned(spark, root, "id", 10, 20)
    assert "score" in old_only.columns


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check of the ACID surface: random sequences of
    append / overwrite / compact / idempotent-append / vacuum are
    replayed against a pure-Python model of the table (a dict of
    version -> row multiset). After EVERY op: head snapshot == model
    head, every retained version time-travels to its model snapshot,
    and the change feed from any retained cursor equals the model's
    delta. Deterministic seeds — failures reproduce."""
    import random

    for seed in (7, 23, 61):
        rng = random.Random(seed)
        root = str(tmp_path / f"t{seed}")
        model: dict[int, list[int]] = {}   # version -> sorted ids
        feeds: dict[int, list[int]] = {}   # version -> ids its commit ADDED
        next_id = 0
        idem_batch = 0

        def fresh(n):
            nonlocal next_id
            ids = list(range(next_id, next_id + n))
            next_id += n
            return ids

        for _ in range(10):
            op = rng.choice(["append", "append", "overwrite", "compact", "idem", "vacuum"])
            head = txlog.tx_head(root)
            if op == "compact" and head is None:
                continue
            if op == "append" or (op in ("overwrite", "compact", "idem", "vacuum") and head is None):
                ids = fresh(rng.randint(1, 5))
                v = txlog.tx_write(_df(spark, ids[0], ids[-1] + 1, "m"), root)
                model[v] = sorted((model.get(v - 1) or []) + ids)
                feeds[v] = ids
            elif op == "overwrite":
                ids = fresh(rng.randint(1, 4))
                v = txlog.tx_write(_df(spark, ids[0], ids[-1] + 1, "m"), root, mode="overwrite")
                model[v] = sorted(ids)
                feeds[v] = None  # overwrite: feed resets to the snapshot
            elif op == "compact":
                v = txlog.tx_compact(spark, root, target_file_bytes=4096)
                model[v] = model[v - 1]
                feeds[v] = None
            elif op == "idem":
                ids = fresh(2)
                v = txlog.tx_write_idempotent(
                    _df(spark, ids[0], ids[0] + 2, "m"), root, "model-app", idem_batch
                )
                assert v is not None
                # replay the same batch id: must be skipped
                assert (
                    txlog.tx_write_idempotent(
                        _df(spark, ids[0], ids[0] + 2, "m"), root, "model-app", idem_batch
                    )
                    is None
                )
                idem_batch += 1
                model[v] = sorted(model.get(v - 1, []) + ids)
                feeds[v] = ids
            elif op == "vacuum":
                txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
                retained = [v for v in model if v > txlog.tx_head(root) - 2]
                for v in list(model):
                    if v not in retained:
                        model.pop(v), feeds.pop(v)

            head = txlog.tx_head(root)
            assert head == max(model)
            for v in model:  # every retained version time-travels exactly
                got = sorted(r.id for r in txlog.tx_read(spark, root, version=v).collect())
                assert got == model[v], (seed, v)
            # change feed from every retained cursor (except head)
            for since in [v for v in model if v < head]:
                expect: list[int] = []
                for v in range(since + 1, head + 1):
                    if feeds.get(v) is None and v in model:  # overwrite/compact
                        expect = list(model[v])
                    elif v in model and feeds[v]:
                        expect += feeds[v]
                got = sorted(r.id for r in txlog.tx_changes(spark, root, since_version=since).collect())
                assert got == sorted(expect), (seed, since)


def test_head_hint_is_advisory_never_authoritative(spark, tmp_path):
    """r11 O(1) tx_head: the hint is trusted only when its manifest
    exists and the successor doesn't. A crash-stale hint (one behind), a
    corrupted hint, a hint pointing past head, and a missing hint
    (pre-r11 table) must all fall back to the correct answer."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)       # v0
    txlog.tx_write(_df(spark, 5, 10, "b"), root)      # v1
    hint = os.path.join(root, "_txlog", "HEAD.hint")
    assert os.path.exists(hint) and txlog.tx_head(root) == 1

    with open(hint, "w") as f:                        # crash-stale: one behind
        f.write("0")
    assert txlog.tx_head(root) == 1
    with open(hint, "w") as f:                        # pointing past head
        f.write("7")
    assert txlog.tx_head(root) == 1
    with open(hint, "w") as f:                        # corrupted
        f.write("not-a-number")
    assert txlog.tx_head(root) == 1
    os.unlink(hint)                                   # pre-r11 table
    assert txlog.tx_head(root) == 1
    # next commit repairs the hint
    txlog.tx_write(_df(spark, 10, 12, "c"), root)     # v2
    assert open(hint).read().strip() == "2"
    assert txlog.tx_head(root) == 2


def test_model_based_random_exports_match_manifests(spark, tmp_path):
    """r11 (verdict task 3): random op sequences (append / merge with
    deletes / overwrite / restore / evolve / compact / idempotent /
    vacuum), BOTH open-format exporters refreshed after EVERY commit
    (the streaming cadence — exercises the incremental append path AND
    the vacuum rebuild), independent replays compared to the txlog
    manifest at every retained version. tools/export_model_check.py runs
    the same checker over 200 sequences for the committed artifact."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from export_model_check import check_sequence

    total = 0
    for seed in (11, 47, 101):
        total += check_sequence(spark, str(tmp_path), seed, n_ops=8)
    assert total >= 20  # vacuum ops verify-only; everything else exports

    # one sequence with Iceberg manifest merging forced on (the default
    # threshold of 100 is unreachable in short sequences) — merged
    # manifests must stay divergence-free under random ops too
    from devcontainers_etl_node_spark.sinks import iceberg_export

    old = iceberg_export._MANIFEST_MERGE_MIN
    iceberg_export._MANIFEST_MERGE_MIN = 2
    try:
        check_sequence(spark, str(tmp_path / "merged"), 77, n_ops=8)
    finally:
        iceberg_export._MANIFEST_MERGE_MIN = old


# ---------------------------------------------------------------------------
# tx_merge: pruned copy-on-write upsert
# ---------------------------------------------------------------------------


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "id LONG, batch STRING")


def test_merge_rewrites_only_zone_map_matched_files(spark, tmp_path):
    """Two appends with disjoint id ranges => two file sets with disjoint
    zone maps. A merge touching only the second range must carry every
    first-range file entry into the new manifest VERBATIM (path-level
    proof that a small merge into a big table rewrites a handful of
    files) while updating/inserting correctly."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 100, "low").coalesce(1), root)        # v0
    txlog.tx_write(_df(spark, 100, 200, "high").coalesce(1), root)     # v1
    before = {e["path"] for e in txlog._read_manifest(root, 1)["files"]}
    low_files = {e["path"] for e in txlog._read_manifest(root, 0)["files"]}

    v = txlog.tx_merge(
        spark,
        _kv(spark, [(150, "UPDATED"), (160, "UPDATED"), (999, "INSERTED")]),
        root,
        key="id",
    )
    assert v == 2
    m = txlog._read_manifest(root, 2)
    after = {e["path"] for e in m["files"]}
    # every low-range file survived untouched, no low file was rewritten
    assert low_files <= after
    assert set(m["removed"]) == before - low_files
    assert set(m["removed"]).isdisjoint(low_files)

    got = {r["id"]: r["batch"] for r in txlog.tx_read(spark, root).collect()}
    assert len(got) == 201  # 200 originals + 1 insert
    assert got[150] == got[160] == "UPDATED"
    assert got[999] == "INSERTED"
    assert got[0] == "low" and got[50] == "low"
    assert got[120] == "high"  # same file as 150, rewritten but preserved


def test_merge_pure_insert_keeps_all_files(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 50, "a"), root)
    before = {e["path"] for e in txlog._read_manifest(root, 0)["files"]}
    txlog.tx_merge(spark, _kv(spark, [(1000, "new")]), root, key="id")
    m = txlog._read_manifest(root, 1)
    assert before <= {e["path"] for e in m["files"]}
    assert m["removed"] == []
    assert txlog.tx_read(spark, root).count() == 51


def test_merge_rejects_bad_sources(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)
    with pytest.raises(ValueError, match="not unique"):
        txlog.tx_merge(spark, _kv(spark, [(1, "x"), (1, "y")]), root, key="id")
    with pytest.raises(ValueError, match="NULL"):
        txlog.tx_merge(spark, _kv(spark, [(None, "x")]), root, key="id")
    with pytest.raises(ValueError, match="schema"):
        drifted = spark.createDataFrame([(1, 2.5)], "id LONG, batch DOUBLE")
        txlog.tx_merge(spark, drifted, root, key="id")


def test_merge_conflicts_instead_of_rebasing(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a"), root)                       # v0
    txlog.tx_write(_df(spark, 10, 20, "b"), root)                      # v1
    # stale planning basis: caller planned against v0
    with pytest.raises(txlog.TxConflict, match="head is v1"):
        txlog.tx_merge(spark, _kv(spark, [(1, "u")]), root, key="id",
                       expected_head=0)
    # lost commit race: v2 gets taken BETWEEN plan and publish — inject
    # the competing commit inside the merge's staging step
    import json as _json

    real_stage = txlog._stage_files

    def stage_then_lose_race(df, r):
        entries = real_stage(df, r)
        nxt = txlog._manifest_path(root, 2)
        if not os.path.exists(nxt):  # merge stages twice (rewrite + CDF)
            with open(nxt, "x") as f:
                _json.dump(txlog._read_manifest(root, 1) | {"version": 2}, f)
        return entries

    txlog._stage_files = stage_then_lose_race
    try:
        with pytest.raises(txlog.TxConflict, match="re-run the merge"):
            txlog.tx_merge(spark, _kv(spark, [(1, "u")]), root, key="id")
    finally:
        txlog._stage_files = real_stage


def test_changes_feed_does_not_double_count_merge_survivors(spark, tmp_path):
    """tx_changes spanning a merge must drop the merge's removed files:
    their surviving rows were re-staged into the added files, so keeping
    both would feed survivors twice."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)           # v0
    txlog.tx_write(_df(spark, 10, 20, "b").coalesce(1), root)          # v1
    txlog.tx_merge(spark, _kv(spark, [(15, "U"), (99, "I")]), root, key="id")  # v2
    feed = txlog.tx_changes(spark, root, since_version=0)
    rows = feed.groupBy("id").count().filter("count > 1").collect()
    assert rows == []  # no duplicated survivor
    got = {r["id"]: r["batch"] for r in feed.collect()}
    # the feed covers everything added-or-changed after v0: all of v1's
    # file content (rewritten with the update applied) plus the insert
    assert got[15] == "U" and got[99] == "I" and got[10] == "b"


def test_incremental_from_table_rejects_merged_corpus(spark, tmp_path):
    from devcontainers_etl_node_spark import incremental

    root = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    docs = spark.createDataFrame(
        [(i, f"doc text number {i} with words") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    txlog.tx_write(docs, root)
    incremental.run_incremental_dedup_from_table(spark, root, work)
    txlog.tx_merge(
        spark,
        spark.createDataFrame([(3, "rewritten doc")], "doc_id LONG, text STRING"),
        root,
        key="doc_id",
    )
    with pytest.raises(ValueError, match="MERGED"):
        incremental.run_incremental_dedup_from_table(spark, root, work)


def test_merge_with_tombstones_applies_full_iud_changelog(spark, tmp_path):
    """delete_col: TRUE rows remove their key, FALSE/NULL rows upsert, a
    tombstone for an absent key is a no-op, and the flag column never
    reaches the table schema."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "base"), root)

    changelog = spark.createDataFrame(
        [
            (3, "updated", False),
            (5, None, True),        # delete existing key
            (77, "inserted", None), # NULL flag = not deleted
            (99, None, True),       # tombstone for absent key: no-op
        ],
        "id LONG, batch STRING, is_delete BOOLEAN",
    )
    txlog.tx_merge(spark, changelog, root, key="id", delete_col="is_delete")

    snap = txlog.tx_read(spark, root)
    assert set(snap.columns) == {"id", "batch"}  # flag stripped
    got = {r["id"]: r["batch"] for r in snap.collect()}
    assert 5 not in got and 99 not in got
    assert got[3] == "updated" and got[77] == "inserted"
    assert len(got) == 10  # 10 base - 1 delete + 1 insert
    # manifest schema stayed the table schema
    assert "is_delete" not in txlog._read_manifest(root, 1)["schema"]


def test_merge_delete_only_batch_can_empty_touched_file(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a").coalesce(1), root)
    dels = spark.createDataFrame(
        [(i, None, True) for i in range(5)], "id LONG, batch STRING, is_delete BOOLEAN"
    )
    txlog.tx_merge(spark, dels, root, key="id", delete_col="is_delete")
    assert txlog.tx_read(spark, root).count() == 0


def test_restore_rolls_back_content_as_a_new_commit(spark, tmp_path):
    """tx_restore re-references an old version's files without copying
    data: content equals the restored version, the bad version stays
    time-travel readable, the change feed resets at the restore, and a
    vacuumed target fails loudly."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "good"), root)                      # v0
    txlog.tx_write(_df(spark, 0, 3, "bad"), root, mode="overwrite")      # v1
    v = txlog.tx_restore(root, 0)                                        # v2
    assert v == 2
    got = txlog.tx_read(spark, root)
    assert got.count() == 10 and {r["batch"] for r in got.collect()} == {"good"}
    # no data was copied: v2 references exactly v0's files
    assert txlog._read_manifest(root, 2)["files"] == txlog._read_manifest(root, 0)["files"]
    # the bad version is still time-travelable until vacuum
    assert txlog.tx_read(spark, root, version=1).count() == 3
    # the feed resets at the restore (content was replaced)
    ch = txlog.tx_changes(spark, root, since_version=1)
    assert {r["batch"] for r in ch.collect()} == {"good"}

    # restoring to a vacuumed version fails loudly
    txlog.tx_write(_df(spark, 0, 2, "x"), root, mode="overwrite")        # v3
    txlog.tx_vacuum(root, keep_last=1, retention_hours=0)
    with pytest.raises(FileNotFoundError):
        txlog.tx_restore(root, 0)
    with pytest.raises(ValueError, match="head is"):
        txlog.tx_restore(root, 99)


def test_model_based_random_ops_with_merge_and_restore(spark, tmp_path):
    """Model-based check extended over the round-9 surface: random
    sequences of append / overwrite / MERGE (upserts + inserts +
    tombstones) / RESTORE / compact / vacuum against a pure-Python
    membership model. After every op: head and every retained version
    time-travel to the model exactly. Feeds across merges are checked by
    property (no duplicate ids; feed ⊆ head snapshot; every id
    inserted-or-upserted after the cursor that survives to head is fed;
    no id whose last change after the cursor was a deletion appears) —
    the exact-delta model only applies between merges, because a merge's
    added files legitimately re-feed survivors of rewritten files."""
    import random

    for seed in (11, 42):
        rng = random.Random(seed)
        root = str(tmp_path / f"t{seed}")
        model: dict[int, set[int]] = {}    # version -> id set
        ups: dict[int, set[int]] = {}      # ids upserted at v (merge)
        ins: dict[int, set[int]] = {}      # ids inserted at v (merge/append)
        dels: dict[int, set[int]] = {}     # ids tombstoned at v
        resets: set[int] = set()           # overwrite/compact/restore versions
        next_id = 0

        def fresh(n):
            nonlocal next_id
            ids = list(range(next_id, next_id + n))
            next_id += n
            return ids

        def kv(rows):
            return spark.createDataFrame(rows, "id LONG, batch STRING, is_delete BOOLEAN")

        for step in range(12):
            head = txlog.tx_head(root)
            op = rng.choice(["append", "merge", "merge", "overwrite", "restore", "compact", "vacuum"])
            if head is None:
                op = "append"
            if op == "append":
                ids = fresh(rng.randint(1, 4))
                v = txlog.tx_write(_df(spark, ids[0], ids[-1] + 1, "a"), root)
                model[v] = (model.get(v - 1) or set()) | set(ids)
                ins[v] = set(ids)
            elif op == "overwrite":
                ids = fresh(rng.randint(1, 3))
                v = txlog.tx_write(_df(spark, ids[0], ids[-1] + 1, "o"), root, mode="overwrite")
                model[v] = set(ids)
                resets.add(v)
            elif op == "merge":
                cur = sorted(model[head])
                k_up = rng.sample(cur, min(len(cur), rng.randint(0, 2)))
                rest = [i for i in cur if i not in k_up]
                k_del = rng.sample(rest, min(len(rest), rng.randint(0, 2)))
                k_ins = fresh(rng.randint(0, 2))
                rows = (
                    [(i, f"up{step}", False) for i in k_up]
                    + [(i, None, True) for i in k_del]
                    + [(i, f"in{step}", None) for i in k_ins]
                )
                if not rows:
                    rows = [(fresh(1)[0], f"in{step}", False)]
                    k_ins = [rows[0][0]]
                v = txlog.tx_merge(spark, kv(rows), root, key="id", delete_col="is_delete")
                model[v] = (model[head] - set(k_del)) | set(k_up) | set(k_ins)
                ups[v], ins[v], dels[v] = set(k_up), set(k_ins), set(k_del)
            elif op == "restore":
                target = rng.choice(sorted(model))
                v = txlog.tx_restore(root, target)
                model[v] = set(model[target])
                resets.add(v)
            elif op == "compact":
                v = txlog.tx_compact(spark, root, target_file_bytes=4096)
                model[v] = set(model[v - 1])
                resets.add(v)  # feed-wise compact behaves like overwrite
            elif op == "vacuum":
                txlog.tx_vacuum(root, keep_last=3, retention_hours=0)
                kept = {v for v in model if v > txlog.tx_head(root) - 3}
                for d in (model, ups, ins, dels):
                    for v in list(d):
                        if v not in kept:
                            d.pop(v, None)
                resets &= kept

            head = txlog.tx_head(root)
            assert head == max(model), (seed, step)
            for v in model:
                got = {r.id for r in txlog.tx_read(spark, root, version=v).collect()}
                assert got == model[v], (seed, step, v)

            for since in [v for v in model if v < head]:
                rows = txlog.tx_changes(spark, root, since_version=since).collect()
                ids = [r.id for r in rows]
                assert len(ids) == len(set(ids)), (seed, step, since, "dup ids in feed")
                assert set(ids) <= model[head], (seed, step, since, "phantom rows fed")
                # every id changed after the cursor that survives to head is fed
                must = set()
                gone = set()
                for v in range(since + 1, head + 1):
                    if v in resets:
                        must = set(model[v])
                        gone = set()
                        continue
                    must |= ups.get(v, set()) | ins.get(v, set())
                    must -= dels.get(v, set())
                    gone |= dels.get(v, set())
                    gone -= ups.get(v, set()) | ins.get(v, set())
                assert must & model[head] <= set(ids), (seed, step, since, "missing changes")
                assert not (gone & set(ids)), (seed, step, since, "deleted id fed")


def test_committed_column_order_survives_the_manifest_roundtrip(spark, tmp_path):
    """The manifest schema is ORDERED: a table committed with
    non-alphabetical column order must read back in that order (the
    sort_keys JSON round-trip used to alphabetize it, silently reordering
    every read for position-based consumers)."""
    root = str(tmp_path / "t")
    df = spark.range(0, 5).select(
        F.col("id").alias("z_last"),
        (F.col("id") * 2).alias("m_mid"),
        F.lit("x").alias("a_first"),
    )
    txlog.tx_write(df, root)
    got = txlog.tx_read(spark, root)
    assert got.columns == ["z_last", "m_mid", "a_first"]
    # merge + restore preserve it too
    upd = spark.createDataFrame(
        [(1, 99, "u")], "z_last LONG, m_mid LONG, a_first STRING"
    )
    txlog.tx_merge(spark, upd, root, key="z_last")
    assert txlog.tx_read(spark, root).columns == ["z_last", "m_mid", "a_first"]
    txlog.tx_restore(root, 0)
    assert txlog.tx_read(spark, root).columns == ["z_last", "m_mid", "a_first"]


def test_txn_state_survives_vacuum_of_old_manifests(spark, tmp_path):
    """Multi-writer idempotence vs vacuum: another writer pushes an app's
    last commit outside the retained manifest window; the carried per-app
    high-water marks must still recognize a crash-replay of that batch as
    already-committed (without the carry the replay re-appends — the
    exactly-once contract txlog_sink advertises would be violated)."""
    root = str(tmp_path / "t")
    txlog.tx_write_idempotent(_df(spark, 0, 10, "app_b0"), root, "appA", 0)   # v0
    txlog.tx_write_idempotent(_df(spark, 10, 20, "app_b1"), root, "appA", 1)  # v1
    # other writers advance the table past the vacuum window
    for i in range(4):
        txlog.tx_write(_df(spark, 100 + i, 101 + i, f"other{i}"), root)
    deleted = txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    assert any("v0000000000" in p for p in deleted)  # appA's manifests gone
    with pytest.raises(FileNotFoundError):
        txlog._read_manifest(root, 1)
    # the high-water mark survived in the head manifest
    assert txlog.tx_txn_version(root, "appA") == 1
    before = txlog.tx_read(spark, root).count()
    # crash-replay of batch 1: must be skipped, not re-appended
    assert txlog.tx_write_idempotent(_df(spark, 10, 20, "app_b1"), root, "appA", 1) is None
    assert txlog.tx_read(spark, root).count() == before
    # genuinely new batch still lands
    assert txlog.tx_write_idempotent(_df(spark, 20, 25, "app_b2"), root, "appA", 2) is not None


def test_changes_feed_is_exact_across_merges_no_over_delivery(spark, tmp_path):
    """tx_changes across a merge emits EXACTLY the upserted rows plus
    post-cursor appends — never the survivors the rewrite re-staged from
    files committed BEFORE the cursor (the recorded change files make the
    merge contribution O(changelog), not O(rewritten files))."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)           # v0
    txlog.tx_write(_df(spark, 10, 20, "b").coalesce(1), root)          # v1
    # merge touches v0's file (key 5) and inserts a new key
    txlog.tx_merge(spark, _kv(spark, [(5, "U"), (99, "I")]), root, key="id")  # v2
    feed = txlog.tx_changes(spark, root, since_version=1)
    got = {r["id"]: r["batch"] for r in feed.collect()}
    # exactly the merge's changelog — no v0 survivors (0-4, 6-9)
    assert got == {5: "U", 99: "I"}
    # from v0: v1's appends plus the changelog, still no v0 survivors
    feed0 = txlog.tx_changes(spark, root, since_version=0)
    got0 = {r["id"]: r["batch"] for r in feed0.collect()}
    assert got0 == {**{i: "b" for i in range(10, 20)}, 5: "U", 99: "I"}
    # no duplicate ids ever
    assert feed0.groupBy("id").count().filter("count > 1").count() == 0


def test_changes_feed_legacy_merge_exact_flag(spark, tmp_path):
    """Migration path for pre-r10 tables (r10 advice): a merge manifest
    WITHOUT recorded change files makes exact=True raise with a reset
    recipe, while exact=False falls back to the old at-least-once feed —
    the merge's rewritten files whole, so every true upsert is present
    (survivors may re-deliver, never silently missing)."""
    import json as _json

    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)                 # v0
    txlog.tx_merge(spark, _kv(spark, [(5, "U"), (99, "I")]), root, key="id")  # v1
    # simulate a legacy manifest: strip the recorded change files
    mpath = txlog._manifest_path(root, 1)
    m = _json.load(open(mpath))
    del m["change_files"]
    with open(mpath, "w") as f:
        _json.dump(m, f)

    with pytest.raises(ValueError, match="predates change-file"):
        txlog.tx_changes(spark, root, since_version=0)

    got = {r["id"]: r["batch"] for r in
           txlog.tx_changes(spark, root, since_version=0, exact=False).collect()}
    # at-least-once: the upserts are all there...
    assert got[5] == "U" and got[99] == "I"
    # ...and the re-delivered survivors carry their committed values
    assert all(got[i] == "a" for i in range(10) if i != 5 and i in got)
    # merges that DID record change files stay exact under either flag
    txlog.tx_merge(spark, _kv(spark, [(7, "U2")]), root, key="id")           # v2
    exact_tail = {r["id"]: r["batch"] for r in
                  txlog.tx_changes(spark, root, since_version=1, exact=False).collect()}
    assert exact_tail[7] == "U2"


def test_changes_feed_merge_deletes_and_updates_post_cursor_rows(spark, tmp_path):
    """A row appended inside the cursor window then UPDATED by a later
    merge appears once at its post-image; one DELETED by a later merge
    does not appear at all (it no longer exists — a new-docs consumer
    must not ingest it)."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)           # v0
    txlog.tx_write(_df(spark, 10, 20, "b").coalesce(1), root)          # v1
    changelog = spark.createDataFrame(
        [(12, "U2", False), (15, None, True)],
        "id LONG, batch STRING, is_delete BOOLEAN",
    )
    txlog.tx_merge(spark, changelog, root, key="id", delete_col="is_delete")  # v2
    got = {r["id"]: r["batch"] for r in txlog.tx_changes(spark, root, since_version=0).collect()}
    expected = {i: "b" for i in range(10, 20) if i != 15}
    expected[12] = "U2"
    assert got == expected
    # change files survive vacuum while their merge manifest is retained
    txlog.tx_write(_df(spark, 50, 51, "c"), root)                      # v3
    txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    got2 = {r["id"]: r["batch"] for r in txlog.tx_changes(spark, root, since_version=1).collect()}
    assert got2[12] == "U2" and 15 not in got2 and got2[50] == "c"


def test_float_zone_maps_excluded_for_nan_soundness(spark, tmp_path):
    """Parquet float stats exclude NaN while Spark orders NaN above every
    double — so float columns must record NO zone map (a pruned file could
    otherwise hide NaN rows an unpruned scan's filter would return)."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 0.5), (3, 2.5)], "id LONG, score DOUBLE"
    ).coalesce(1)
    txlog.tx_write(df, root)
    entry = txlog._read_manifest(root, 0)["files"][0]
    stats = entry.get("stats") or {}
    assert "score" not in stats and "id" in stats
    # pruning on the float column keeps every file (sound, not heuristic)
    assert len(txlog.tx_prune_files(root, "score", 0.0, 1.0)) == 1
    got = txlog.tx_read_pruned(spark, root, "score", 0.0, 1.0).collect()
    assert [r.id for r in got] == [2]
