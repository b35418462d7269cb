"""Apache Iceberg interop (sinks/iceberg_export.py + avro_lite.py): the
txlog history exported as a standard Iceberg v2 metadata tree and
validated by an independent replay through the Avro containers' own
embedded schemas; the Spark reader is gated (no Iceberg jars here)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.sinks import avro_lite, txlog
from devcontainers_etl_node_spark.sinks.iceberg_export import (
    iceberg_snapshot,
    read_iceberg,
    tx_export_iceberg,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("batch"))


def test_avro_container_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": ["null", "long"]}],
                },
            },
        ],
    }
    recs = [
        {"l": -(2**62), "i": 42, "s": None, "d": 1.5, "b": True,
         "arr": [1, -2], "m": {"k": "v"}, "nested": {"x": 7}},
        {"l": 0, "i": -1, "s": "héllo", "d": -0.0, "b": False,
         "arr": [], "m": {}, "nested": {"x": None}},
    ]
    avro_lite.write_container("/tmp/avro_rt.avro", schema, recs, metadata={"k": "v"})
    got_schema, meta, got = avro_lite.read_container("/tmp/avro_rt.avro")
    assert got == recs
    assert got_schema == schema  # schema survives the header round-trip
    assert meta["k"] == b"v"


def test_export_roundtrip_matches_manifest_with_time_travel(spark, tmp_path):
    """append/append/overwrite history: the replay of the CURRENT
    snapshot equals the head manifest (paths, sizes, per-file record
    counts); replaying an OLDER snapshot id equals that version's
    manifest — Iceberg time travel from the exported tree alone."""
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 10, "a").coalesce(1), root)                 # v0
    txlog.tx_write(_df(spark, 10, 30, "b").coalesce(1), root)                # v1
    txlog.tx_write(_df(spark, 0, 5, "c").coalesce(1), root, mode="overwrite")  # v2
    meta_path = tx_export_iceberg(root)
    assert os.path.basename(meta_path) == "v3.metadata.json"

    def expect(version):
        m = txlog._read_manifest(root, version)
        return {
            os.path.abspath(root) + "/" + e["path"]: (e["bytes"], e["rows"])
            for e in m["files"]
        }

    snap = iceberg_snapshot(root)
    assert snap["sequence_number"] == 3 and len(snap["snapshots"]) == 3
    assert {p: (f["size"], f["records"]) for p, f in snap["files"].items()} == expect(2)
    assert sum(f["records"] for f in snap["files"].values()) == 5
    # time travel to the middle snapshot (id 1001 = second retained commit)
    old = iceberg_snapshot(root, snapshot_id=1001)
    assert {p: (f["size"], f["records"]) for p, f in old["files"].items()} == expect(1)
    assert sum(f["records"] for f in old["files"].values()) == 30
    # schema carries Iceberg field ids and mapped types
    fields = snap["schema"]["fields"]
    assert [(f["id"], f["name"], f["type"]) for f in fields] == [
        (1, "id", "long"),
        (2, "batch", "string"),
    ]
    # every referenced data file exists on disk
    for p in snap["files"]:
        assert os.path.exists(p)


def test_export_schema_evolution_appends_schema_id(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)
    txlog.tx_write(
        _df(spark, 5, 10, "b").withColumn("score", F.lit(1.5)),
        root,
        allow_schema_change=True,
    )
    tx_export_iceberg(root)
    with open(os.path.join(root, "metadata", "v2.metadata.json")) as f:
        md = json.load(f)
    assert [s["schema-id"] for s in md["schemas"]] == [0, 1]
    assert md["current-schema-id"] == 1
    names = [f["name"] for f in md["schemas"][1]["fields"]]
    assert names == ["id", "batch", "score"]
    # the two snapshots reference their own schema ids
    assert [s["schema-id"] for s in md["snapshots"]] == [0, 1]


def test_export_nested_types_get_fresh_field_ids(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 3).select(
        F.col("id"),
        F.array(F.col("id").cast("double")).alias("vec"),
        F.create_map(F.lit("k"), F.col("id")).alias("kv"),
        F.col("id").cast("decimal(10,2)").alias("money"),
    )
    txlog.tx_write(df, root)
    tx_export_iceberg(root)
    schema = iceberg_snapshot(root)["schema"]
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["vec"]["type"]["type"] == "list"
    assert by_name["vec"]["type"]["element"] == "double"
    assert by_name["kv"]["type"]["type"] == "map"
    assert by_name["money"]["type"] == "decimal(10, 2)"
    # ids: top-level 1..4, nested continue after (unique across the schema)
    ids = [f["id"] for f in schema["fields"]]
    nested = [by_name["vec"]["type"]["element-id"],
              by_name["kv"]["type"]["key-id"], by_name["kv"]["type"]["value-id"]]
    assert ids == [1, 2, 3, 4] and len(set(ids + nested)) == 7


def test_reexport_is_incremental_with_stable_ids_and_reused_manifests(spark, tmp_path):
    """r11 (r10 advice): re-export appends only snapshots past the
    exported head — prior manifest/list Avro files are untouched and
    REUSED by path, field ids resume from the persisted schemas (no
    remap), version-hint flips atomically, and a no-op re-export returns
    the current metadata without writing. Vacuum forces a rebuild."""
    root = str(tmp_path / "t")
    txlog.tx_write(
        spark.range(0, 5).select(
            F.col("id"), F.array(F.col("id").cast("double")).alias("vec")
        ),
        root,
    )                                                                    # v0
    tx_export_iceberg(root)
    meta = os.path.join(root, "metadata")
    avro_before = {
        p: (os.path.getmtime(os.path.join(meta, p)), os.path.getsize(os.path.join(meta, p)))
        for p in os.listdir(meta)
        if p.endswith(".avro")
    }
    ids_before = {f["name"]: f["id"] for f in iceberg_snapshot(root)["schema"]["fields"]}
    elem_id_before = next(
        f["type"]["element-id"]
        for f in iceberg_snapshot(root)["schema"]["fields"]
        if f["name"] == "vec"
    )

    txlog.tx_write(
        spark.range(5, 10).select(
            F.col("id"), F.array(F.col("id").cast("double")).alias("vec")
        ),
        root,
    )                                                                    # v1 (append)
    path2 = tx_export_iceberg(root)
    assert path2.endswith("v2.metadata.json")
    # prior avro files untouched and still referenced (manifest reuse)
    for p, sig in avro_before.items():
        full = os.path.join(meta, p)
        assert os.path.exists(full)
        assert (os.path.getmtime(full), os.path.getsize(full)) == sig
    snap = iceberg_snapshot(root)
    assert {f["name"]: f["id"] for f in snap["schema"]["fields"]} == ids_before
    assert next(
        f["type"]["element-id"] for f in snap["schema"]["fields"] if f["name"] == "vec"
    ) == elem_id_before
    assert len(snap["files"]) >= 2 and snap["sequence_number"] == 2
    manifest = txlog._read_manifest(root, txlog.tx_head(root))
    loc = os.path.abspath(root)
    assert set(snap["files"]) == {f"{loc}/{e['path']}" for e in manifest["files"]}

    # no-op re-export: returns the same metadata, writes nothing new
    files_now = set(os.listdir(meta))
    assert tx_export_iceberg(root).endswith("v2.metadata.json")
    assert set(os.listdir(meta)) == files_now

    # incremental tree ≡ full rebuild (force one by removing the marker)
    os.remove(os.path.join(meta, ".txlog_export.json"))
    tx_export_iceberg(root)
    rebuilt = iceberg_snapshot(root)
    assert rebuilt["files"] == snap["files"]
    assert rebuilt["schema"] == snap["schema"]

    # vacuum moves the base -> rebuild renumbered from the retained tail
    txlog.tx_write(_df(spark, 0, 1, "x").select(F.col("id"), F.array(F.col("id").cast("double")).alias("vec")), root)  # v2
    txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    tx_export_iceberg(root)
    assert iceberg_snapshot(root)["sequence_number"] == 2


def test_manifest_merging_bounds_list_growth(spark, tmp_path, monkeypatch):
    """r11 (1000-batch bench finding): append commits carry every prior
    manifest, so the manifest LIST grows O(batches) — at the merge
    threshold the carried manifests are rewritten into one whose entries
    keep their ORIGINAL sequence numbers with status EXISTING (the
    Iceberg writers' commit.manifest.min-count-to-merge behavior).
    Post-merge: list length bounded, head file set exact, time travel to
    pre-merge snapshots still exact (their lists reference the OLD
    manifest files, which are never deleted)."""
    from devcontainers_etl_node_spark.sinks import iceberg_export
    from devcontainers_etl_node_spark.sinks.avro_lite import read_container

    monkeypatch.setattr(iceberg_export, "_MANIFEST_MERGE_MIN", 4)
    root = str(tmp_path / "t")
    for i in range(7):
        txlog.tx_write(_df(spark, i * 10, i * 10 + 5, f"b{i}").coalesce(1), root)
        tx_export_iceberg(root)  # incremental append path each commit

    meta = os.path.join(root, "metadata")
    with open(os.path.join(meta, "version-hint.text")) as f:
        md = json.load(open(os.path.join(meta, f"v{int(f.read())}.metadata.json")))
    cur = next(s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"])
    _, _, mlist = read_container(cur["manifest-list"])
    # 7 appends with threshold 4: merges keep the carried list bounded
    assert len(mlist) < 5
    merged = [m for m in mlist if m["existing_files_count"] > 0]
    assert merged, "a merged manifest must exist"
    _, _, entries = read_container(merged[0]["manifest_path"])
    # merged entries: status EXISTING, original sequence numbers kept
    assert all(e["status"] == 0 for e in entries)
    assert min(e["sequence_number"] for e in entries) == 1
    assert merged[0]["min_sequence_number"] == 1

    # head exact vs the txlog manifest
    manifest = txlog._read_manifest(root, txlog.tx_head(root))
    loc = os.path.abspath(root)
    snap = iceberg_snapshot(root)
    assert set(snap["files"]) == {f"{loc}/{e['path']}" for e in manifest["files"]}
    assert sum(v["records"] for v in snap["files"].values()) == 35
    # time travel to a pre-merge snapshot still exact
    old = iceberg_snapshot(root, snapshot_id=1001)  # after 2nd append
    m1 = txlog._read_manifest(root, 1)
    assert set(old["files"]) == {f"{loc}/{e['path']}" for e in m1["files"]}


def test_decimal_nested_inside_struct_and_map_exports(spark, tmp_path):
    """r10 advice regression (shared _split_top): a decimal(p,s) nested
    in struct<>/map<> must not be split on its internal comma."""
    root = str(tmp_path / "t")
    df = spark.range(0, 3).select(
        F.col("id"),
        F.struct(
            F.col("id").cast("decimal(10,2)").alias("amt"),
            F.col("id").alias("n"),
        ).alias("st"),
        F.create_map(F.lit("k"), F.col("id").cast("decimal(7,3)")).alias("kv"),
    )
    txlog.tx_write(df, root)
    tx_export_iceberg(root)
    by_name = {f["name"]: f for f in iceberg_snapshot(root)["schema"]["fields"]}
    st_fields = {f["name"]: f["type"] for f in by_name["st"]["type"]["fields"]}
    assert st_fields == {"amt": "decimal(10, 2)", "n": "long"}
    assert by_name["kv"]["type"]["key"] == "string"
    assert by_name["kv"]["type"]["value"] == "decimal(7, 3)"


def test_field_ids_stable_across_schema_evolution_with_nested_types(spark, tmp_path):
    """Iceberg readers project BY FIELD ID: after an evolution appends a
    column, every pre-existing path — including nested element ids —
    must keep its id, and the new column gets a fresh one (a naive
    per-version reassignment would shift nested ids and silently remap
    data)."""
    root = str(tmp_path / "t")
    df = spark.range(0, 3).select(
        F.col("id"), F.array(F.col("id").cast("double")).alias("vec")
    )
    txlog.tx_write(df, root)
    txlog.tx_write(
        spark.range(3, 6).select(
            F.col("id"),
            F.array(F.col("id").cast("double")).alias("vec"),
            F.lit("x").alias("tag"),
        ),
        root,
        allow_schema_change=True,
    )
    tx_export_iceberg(root)
    with open(os.path.join(root, "metadata", "v2.metadata.json")) as f:
        md = json.load(f)
    s0, s1 = md["schemas"]

    def ids(schema):
        out = {}
        for fld in schema["fields"]:
            out[fld["name"]] = fld["id"]
            if isinstance(fld["type"], dict) and fld["type"].get("type") == "list":
                out[fld["name"] + ".element"] = fld["type"]["element-id"]
        return out

    i0, i1 = ids(s0), ids(s1)
    assert i0 == {"id": 1, "vec": 2, "vec.element": 3}
    # pre-existing paths keep their ids; the appended column is fresh
    assert {k: i1[k] for k in i0} == i0
    assert i1["tag"] == 4
    assert md["last-column-id"] == 4


def test_export_after_vacuum_renumbers_from_retained_tail(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(5):
        txlog.tx_write(_df(spark, i * 10, (i + 1) * 10, f"b{i}"), root)
    txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
    tx_export_iceberg(root)
    snap = iceberg_snapshot(root)
    assert len(snap["snapshots"]) == 2 and snap["sequence_number"] == 2
    m = txlog._read_manifest(root, txlog.tx_head(root))
    assert set(snap["files"]) == {
        os.path.abspath(root) + "/" + e["path"] for e in m["files"]
    }


def test_spark_iceberg_reader_is_gated_with_a_clear_error(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.tx_write(_df(spark, 0, 5, "a"), root)
    tx_export_iceberg(root)
    try:
        df = read_iceberg(spark, root)
    except RuntimeError as e:
        assert "iceberg-spark-runtime" in str(e) and "iceberg_snapshot" in str(e)
    else:
        assert df.count() == 5  # a runtime WITH the jars reads it directly


def test_append_commits_reuse_prior_manifests(spark, tmp_path):
    """Manifest reuse (the Iceberg writers' scale behavior): K appends
    produce K manifests with each file listed EXACTLY ONCE across the
    metadata dir — export work per append is O(added files), not
    O(table) — while an overwrite resets to one snapshot-complete
    manifest. Replay stays exact at every snapshot."""
    root = str(tmp_path / "t")
    for i in range(3):
        txlog.tx_write(_df(spark, i * 10, (i + 1) * 10, f"b{i}").coalesce(1), root)
    tx_export_iceberg(root)
    snap = iceberg_snapshot(root)
    _, _, mlist = avro_lite.read_container(
        # current snapshot's manifest list
        json.load(open(os.path.join(root, "metadata", "v3.metadata.json")))[
            "snapshots"
        ][-1]["manifest-list"]
    )
    assert len(mlist) == 3  # one delta manifest per append, all carried
    total_entries = 0
    for mf in mlist:
        _, _, entries = avro_lite.read_container(mf["manifest_path"])
        total_entries += len(entries)
    m = txlog._read_manifest(root, txlog.tx_head(root))
    assert total_entries == len(m["files"])  # each file listed exactly once
    assert sum(f["records"] for f in snap["files"].values()) == 30
    # middle snapshot replays exactly its own two appends
    old = iceberg_snapshot(root, snapshot_id=1001)
    assert sum(f["records"] for f in old["files"].values()) == 20

    # an overwrite resets the chain to one snapshot-complete manifest
    txlog.tx_write(_df(spark, 0, 5, "ow"), root, mode="overwrite")
    tx_export_iceberg(root)
    md = json.load(open(os.path.join(root, "metadata", "v4.metadata.json")))
    _, _, mlist2 = avro_lite.read_container(md["snapshots"][-1]["manifest-list"])
    assert len(mlist2) == 1
    assert sum(
        f["records"] for f in iceberg_snapshot(root)["files"].values()
    ) == 5


def test_merge_and_compact_commits_reset_to_snapshot_complete_manifests(spark, tmp_path):
    """Commits that REMOVE files (merge, compaction) cannot reuse prior
    manifests — they reset to one snapshot-complete manifest, and the
    replay still matches the txlog manifest exactly at head and at every
    older snapshot."""
    root = str(tmp_path / "t")
    for i in range(2):
        txlog.tx_write(_df(spark, i * 10, (i + 1) * 10, f"b{i}").coalesce(1), root)
    changelog = spark.createDataFrame(
        [(5, "U", False), (15, None, True)], "id LONG, batch STRING, is_delete BOOLEAN"
    )
    txlog.tx_merge(spark, changelog, root, key="id", delete_col="is_delete")  # v2
    txlog.tx_compact(spark, root, target_file_bytes=1 << 20)                  # v3
    tx_export_iceberg(root)
    md = json.load(open(os.path.join(root, "metadata", "v4.metadata.json")))
    lists = []
    for s in md["snapshots"]:
        _, _, mlist = avro_lite.read_container(s["manifest-list"])
        lists.append(len(mlist))
    assert lists == [1, 2, 1, 1]  # append, append(reuse), merge reset, compact reset
    # head replay == head manifest (19 rows: 20 - 1 delete, value updated)
    m = txlog._read_manifest(root, txlog.tx_head(root))
    snap = iceberg_snapshot(root)
    assert set(snap["files"]) == {
        os.path.abspath(root) + "/" + e["path"] for e in m["files"]
    }
    assert sum(f["records"] for f in snap["files"].values()) == 19
    # the pre-merge snapshot still replays its exact file set
    old = iceberg_snapshot(root, snapshot_id=1001)
    m1 = txlog._read_manifest(root, 1)
    assert set(old["files"]) == {
        os.path.abspath(root) + "/" + e["path"] for e in m1["files"]
    }
