"""Delta Lake interop (sinks/delta_export.py): the txlog manifest
history exported as a standard _delta_log/ action stream, validated by
an independent replay; the Spark-side reader is gated behind a clear
error because this environment ships no Delta jars."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.sinks import txlog
from devcontainers_etl_node_spark.sinks.delta_export import (
    delta_log_snapshot,
    read_delta,
    tx_export_delta,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("batch"))


def test_export_roundtrip_matches_manifest_across_all_commit_modes(spark, tmp_path):
    """append + idempotent append + merge (I/U/D) + overwrite: replaying
    the exported Delta log must reconstruct exactly the head manifest's
    file list (paths, sizes, per-file numRecords), the committed schema,
    and the carried txn high-water marks."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)                  # v0
    txlog.tx_write_idempotent(_df(spark, 10, 20, "b").coalesce(1), root, "appA", 3)  # v1
    changelog = spark.createDataFrame(
        [(5, "U", False), (12, None, True), (99, "I", False)],
        "id LONG, batch STRING, is_delete BOOLEAN",
    )
    txlog.tx_merge(spark, changelog, root, key="id", delete_col="is_delete")  # v2
    written = tx_export_delta(root)
    assert [os.path.basename(p) for p in written] == [
        f"{i:020d}.json" for i in range(3)
    ]

    snap = delta_log_snapshot(root)
    manifest = txlog._read_manifest(root, txlog.tx_head(root))
    assert snap["version"] == 2
    assert set(snap["files"]) == {e["path"] for e in manifest["files"]}
    for e in manifest["files"]:
        assert snap["files"][e["path"]]["size"] == e["bytes"]
        assert snap["files"][e["path"]]["numRecords"] == e["rows"]
    assert [f["name"] for f in snap["schema"]["fields"]] == ["id", "batch"]
    assert [f["type"] for f in snap["schema"]["fields"]] == ["long", "string"]
    assert snap["txns"] == {"appA": 3}

    # the data files the log references exist and total the table rows
    total = sum(v["numRecords"] for v in snap["files"].values())
    assert total == txlog.tx_read(spark, root).count()
    for p in snap["files"]:
        assert os.path.exists(os.path.join(root, p))


def test_export_renumbers_from_the_retained_tail_after_vacuum(spark, tmp_path):
    """Vacuumed history: the export starts at the oldest RETAINED
    manifest, carried as a full snapshot of adds (the Delta checkpoint
    shape), renumbered from 0 — and still replays to the head state."""
    root = str(tmp_path / "t")
    for i in range(5):
        txlog.tx_write(_df(spark, i * 10, (i + 1) * 10, f"b{i}"), root)
    txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    written = tx_export_delta(root)
    assert len(written) == 2  # only the retained window
    snap = delta_log_snapshot(root)
    manifest = txlog._read_manifest(root, txlog.tx_head(root))
    assert set(snap["files"]) == {e["path"] for e in manifest["files"]}
    assert snap["version"] == 1


def test_export_emits_metadata_again_on_schema_evolution(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)
    txlog.tx_write(
        _df(spark, 5, 10, "b").withColumn("extra", F.lit(1.5)),
        root,
        allow_schema_change=True,
    )
    tx_export_delta(root)
    # commit 1 must carry a fresh metaData action with the evolved schema
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json")) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert len(metas) == 1
    fields = json.loads(metas[0]["schemaString"])["fields"]
    assert [f["name"] for f in fields] == ["id", "batch", "extra"]
    snap = delta_log_snapshot(root)
    assert [f["name"] for f in snap["schema"]["fields"]] == ["id", "batch", "extra"]


def test_export_is_idempotent_and_keeps_a_stable_table_id(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)

    def table_id() -> str:
        with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
            for line in f:
                a = json.loads(line)
                if "metaData" in a:
                    return a["metaData"]["id"]
        raise AssertionError("no metaData action")

    tx_export_delta(root)
    first = table_id()
    txlog.tx_write(_df(spark, 5, 10, "b"), root)
    tx_export_delta(root)  # rebuild over the old log
    assert table_id() == first  # readers see the SAME table, one more commit
    assert delta_log_snapshot(root)["version"] == 1


def test_reexport_is_incremental_and_atomic(spark, tmp_path):
    """r11 (r10 advice): re-export APPENDS only the commits past the
    exported head — earlier commit files are not rewritten (byte-
    identical, same inode-level content), per-call work is O(new
    commits), and a no-op re-export writes nothing. Vacuum moves the
    renumbering base and forces the full rebuild."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)                         # v0
    first = tx_export_delta(root)
    assert len(first) == 1
    c0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
    before = open(c0, "rb").read()
    mtime = os.path.getmtime(c0)

    txlog.tx_write(_df(spark, 5, 10, "b"), root)                        # v1
    second = tx_export_delta(root)
    assert [os.path.basename(p) for p in second] == [f"{1:020d}.json"]
    assert open(c0, "rb").read() == before and os.path.getmtime(c0) == mtime
    assert delta_log_snapshot(root)["version"] == 1

    # idempotent no-op: nothing written, log unchanged
    assert tx_export_delta(root) == []
    assert delta_log_snapshot(root)["version"] == 1

    # incremental result ≡ full rebuild (delete the marker to force one)
    snap_inc = delta_log_snapshot(root)
    os.remove(os.path.join(root, "_delta_log", ".txlog_export.json"))
    rebuilt = tx_export_delta(root)
    assert len(rebuilt) == 2
    assert delta_log_snapshot(root) == snap_inc

    # vacuum drops the base -> full rebuild renumbered from the tail
    txlog.tx_write(_df(spark, 10, 15, "c"), root)                       # v2
    txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    written = tx_export_delta(root)
    assert len(written) == 2
    assert delta_log_snapshot(root)["version"] == 1


def test_nested_types_translate_to_delta_schema_json(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 3).select(
        F.col("id"),
        F.array(F.col("id").cast("double")).alias("vec"),
        F.create_map(F.lit("k"), F.col("id")).alias("kv"),
        F.struct(F.col("id").alias("a"), F.lit("s").alias("b")).alias("st"),
        F.col("id").cast("decimal(12,2)").alias("money"),
    )
    txlog.tx_write(df, root)
    tx_export_delta(root)
    fields = {f["name"]: f["type"] for f in delta_log_snapshot(root)["schema"]["fields"]}
    assert fields["vec"] == {
        "type": "array", "elementType": "double", "containsNull": True
    }
    assert fields["kv"] == {
        "type": "map", "keyType": "string", "valueType": "long",
        "valueContainsNull": True,
    }
    assert fields["st"]["type"] == "struct"
    assert [f["name"] for f in fields["st"]["fields"]] == ["a", "b"]
    assert fields["money"] == "decimal(12,2)"


def test_decimal_nested_inside_struct_map_array_exports(spark, tmp_path):
    """r10 advice regression: _split_top counted only angle-bracket depth,
    so the comma INSIDE decimal(p,s) split a struct<>/map<> argument list
    and the export crashed (or emitted 'decimal(10'). Depth must also
    track parentheses."""
    root = str(tmp_path / "t")
    df = spark.range(0, 3).select(
        F.col("id"),
        F.struct(
            F.col("id").cast("decimal(10,2)").alias("amt"),
            F.col("id").alias("n"),
        ).alias("st"),
        F.create_map(F.lit("k"), F.col("id").cast("decimal(7,3)")).alias("kv"),
        F.array(F.col("id").cast("decimal(5,1)")).alias("arr"),
        # single-field struct: the pre-fix code emitted 'decimal(10' here
        F.struct(F.col("id").cast("decimal(10,2)").alias("only")).alias("s1"),
    )
    txlog.tx_write(df, root)
    tx_export_delta(root)
    fields = {f["name"]: f["type"] for f in delta_log_snapshot(root)["schema"]["fields"]}
    assert fields["st"] == {
        "type": "struct",
        "fields": [
            {"name": "amt", "type": "decimal(10,2)", "nullable": True, "metadata": {}},
            {"name": "n", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    assert fields["kv"] == {
        "type": "map", "keyType": "string", "valueType": "decimal(7,3)",
        "valueContainsNull": True,
    }
    assert fields["arr"] == {
        "type": "array", "elementType": "decimal(5,1)", "containsNull": True
    }
    assert fields["s1"]["fields"] == [
        {"name": "only", "type": "decimal(10,2)", "nullable": True, "metadata": {}}
    ]


def test_spark_delta_reader_is_gated_with_a_clear_error(spark, tmp_path):
    """No Delta jars in this sandbox: read_delta must fail with an
    actionable message (how to add the runtime, how to validate without
    it) — never an opaque classpath stack."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)
    tx_export_delta(root)
    try:
        df = read_delta(spark, root)
    except RuntimeError as e:
        assert "delta-spark" in str(e) and "delta_log_snapshot" in str(e)
    else:
        # a runtime WITH Delta jars reads the exported table directly —
        # the full round trip this export exists for
        assert df.count() == 5
