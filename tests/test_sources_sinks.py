"""File source/sink behavior: the reference's CSV snapshot tree semantics
(S3/S4/F4/F5/P6/U1 + K6) driven end-to-end through real files."""

from __future__ import annotations

import datetime
import re

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.sinks.files import write_inventory_tree, write_lakehouse_table
from devcontainers_etl_node_spark.sources.files import read_inventory_csv_tree


def _write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_csv_tree_read(spark, tmp_path):
    root = tmp_path / "inventory"
    _write(
        root / "2024" / "01" / "stock_wh-01_20240108.csv",
        "date,product_id,warehouse_id,stock_units\n2024-01-08,1,wh-01,5\n2024-01-08,2,wh-01,7\n",
    )
    _write(
        root / "2024" / "02" / "stock_wh-02_20240205.csv",
        "date,product_id,warehouse_id,stock_units\n2024-02-05,1,wh-02,9\n",
    )
    _write(root / "2024" / "02" / "notes.txt", "ignored — not csv")

    df = read_inventory_csv_tree(spark, str(root))
    rows = df.collect()
    assert len(rows) == 3  # .txt filtered out (extractors.py:93-96)
    assert all(r.object.endswith(".csv") for r in rows)
    whs = {r.warehouse_id for r in rows}
    assert whs == {"wh-01", "wh-02"}


def test_csv_filename_date_inference(spark, tmp_path):
    """CSV without a date column value → date comes from the filename
    (extractors.py:112-114); unparseable date strings → filename fallback;
    no pattern anywhere → null (F4/F5)."""
    root = tmp_path / "inv"
    _write(
        root / "2024" / "03" / "stock_wh-01_2024_03_15.csv",
        "date,product_id,warehouse_id,stock_units\n,3,wh-01,2\nnot-a-date,4,wh-01,1\n",
    )
    _write(
        root / "misc" / "stock_wh-09_nodate.csv",
        "date,product_id,warehouse_id,stock_units\n,5,wh-09,8\n",
    )
    rows = {r.product_id: r for r in read_inventory_csv_tree(spark, str(root)).collect()}
    assert rows[3].date == datetime.date(2024, 3, 15)
    assert rows[4].date == datetime.date(2024, 3, 15)
    assert rows[5].date is None


def test_csv_coercion_defaults(spark, tmp_path):
    """id/stock coercion null→0 (F6, loaders.py:135-137)."""
    root = tmp_path / "inv2"
    _write(
        root / "stock_wh-01_2024-05-01.csv",
        "date,product_id,warehouse_id,stock_units\n2024-05-01,,wh-01,\n",
    )
    r = read_inventory_csv_tree(spark, str(root)).collect()[0]
    assert r.product_id == 0
    assert r.stock_units == 0


def test_empty_prefix_yields_typed_empty_df(spark, tmp_path):
    """Empty prefix → empty DataFrame with the declared schema
    (extractors.py:117-118)."""
    root = tmp_path / "empty"
    root.mkdir()
    df = read_inventory_csv_tree(spark, str(root))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "date",
        "product_id",
        "warehouse_id",
        "stock_units",
        "object",
    ]


def test_inventory_tree_roundtrip(spark, tmp_path):
    """K6 writer → S4 reader round trip through the year=/month= layout."""
    src = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 8), 1, "wh-01", 5),
            (datetime.date(2024, 2, 5), 2, "wh-02", 7),
        ],
        "date date, product_id long, warehouse_id string, stock_units int",
    )
    out = tmp_path / "tree"
    write_inventory_tree(src, str(out))
    assert (out / "year=2024" / "month=01").exists()
    back = read_inventory_csv_tree(spark, str(out))
    assert back.count() == 2
    # partition-pruned read: only January files are touched
    jan = back.filter(F.col("date") < "2024-02-01").collect()
    assert len(jan) == 1 and jan[0].product_id == 1


def test_lakehouse_table_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 5, 10), "A"),
            (2, datetime.datetime(2024, 2, 6, 11), "B"),
        ],
        "id long, ts timestamp, v string",
    )
    path = tmp_path / "lake"
    write_lakehouse_table(df, str(path), ts_col="ts", sort_cols=["id"])
    assert (path / "ym=202401").exists() and (path / "ym=202402").exists()
    back = spark.read.parquet(str(path))
    assert back.count() == 2
    pruned = back.filter(F.col("ym") == "202401")
    assert pruned.count() == 1
    # the predicate must prune at the SCAN (directory level), not post-filter:
    # the FileSourceScan's PartitionFilters carries the ym predicate — at
    # 100 TB this is the difference between listing one month and all of them
    from devcontainers_etl_node_spark.plans import physical_plan

    plan = physical_plan(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ym" in m.group(1), f"no partition pruning in plan:\n{plan}"


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    from devcontainers_etl_node_spark.sinks.files import overwrite_partitions

    path = str(tmp_path / "tbl")
    initial = spark.createDataFrame(
        [(1, "202401", 10.0), (2, "202402", 20.0)], "id long, ym string, v double"
    )
    overwrite_partitions(initial, path, ["ym"])
    # rewrite ONLY ym=202402 with new content
    update = spark.createDataFrame([(3, "202402", 99.0)], "id long, ym string, v double")
    overwrite_partitions(update, path, ["ym"])
    # partition-dir values come back type-inferred (int) — compare as str
    got = {(r.id, str(r.ym), r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "202401", 10.0), (3, "202402", 99.0)}


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from devcontainers_etl_node_spark.sinks.files import compact_small_files

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    stats = compact_small_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_small_files_partitioned_keeps_layout(spark, tmp_path):
    from devcontainers_etl_node_spark.sinks.files import compact_small_files

    path = str(tmp_path / "fragpart")
    df = spark.range(5_000).withColumn("ym", F.when(F.col("id") % 2 == 0, "202401").otherwise("202402"))
    df.repartition(32).write.partitionBy("ym").parquet(path)
    before = {(r.id, r.ym) for r in spark.read.parquet(path).collect()}

    stats = compact_small_files(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_cols=["ym"]
    )
    assert stats["files_after"] < stats["files_before"]
    # partition dirs survive (pruning still works) and data is identical
    assert (tmp_path / "fragpart" / "ym=202401").exists()
    assert (tmp_path / "fragpart" / "ym=202402").exists()
    assert {(r.id, r.ym) for r in spark.read.parquet(path).collect()} == before


def test_zordered_write_narrows_both_dimensions(spark, tmp_path):
    """Z-order clustering: with two independent uniform columns, every
    z-ordered output file covers a narrow slice of BOTH x and y (that is
    what lets parquet min/max stats prune on either), while sorting by x
    alone leaves each file spanning essentially the full y range."""
    from devcontainers_etl_node_spark.sinks.files import write_zordered

    # deterministic pseudo-uniforms from a hash — no rand() nondeterminism
    df = (
        spark.range(20_000)
        .withColumn("x", (F.pmod(F.xxhash64("id"), 100_000) / 100_000.0))
        .withColumn("y", (F.pmod(F.xxhash64("id", F.lit(7)), 100_000) / 100_000.0))
    )
    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    def mean_span(path, col):
        import glob as g

        spans = []
        for f in g.glob(f"{path}/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                (F.max(col) - F.min(col)).alias("span")
            ).collect()[0]
            spans.append(r.span)
        return sum(spans) / len(spans)

    # x-sorted: x is tight but y spans ~everything per file
    assert mean_span(xpath, "y") > 0.9
    # z-ordered: both dimensions narrowed — each file covers a box
    assert mean_span(zpath, "x") < 0.6
    assert mean_span(zpath, "y") < 0.6
    # same rows either way
    assert spark.read.parquet(zpath).count() == 20_000


# ---------------------------------------------------------------------------
# Round-2 widening: columnar format matrix + malformed-record resilience
# ---------------------------------------------------------------------------


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """ORC is the second columnar format big lakehouses standardize on;
    the engine's tables must survive a parquet->orc->parquet trip with
    schema (incl. decimal/timestamp) and values intact."""
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    ).withColumn("price", F.col("id").cast("decimal(12,2)"))
    p = str(tmp_path / "t.orc")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_json_corrupt_records_are_quarantined_not_fatal(spark, tmp_path):
    """PERMISSIVE parsing with _corrupt_record: at 100 TB a handful of
    malformed lines must never kill the job — they land in a quarantine
    column for audit, clean rows parse normally."""
    f = tmp_path / "events.json"
    f.write_text(
        '{"event_id": 1, "v": 10.0}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "v": 20.0}\n'
        '{"event_id": 3, "v": "not-a-double"}\n'
    )
    schema = "event_id long, v double, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(f))
    )
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.event_id for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line and the type-mismatched row
    # the corrupt payloads are preserved verbatim for audit
    assert any("NOT JSON" in r._corrupt_record for r in bad)


def test_csv_schema_drift_columns_union(spark, tmp_path):
    """Schema drift across ingest generations: a late file adding a column
    must not break the read — explicit schema + permissive fill gives the
    union view (the conform/union_by_name path handles the rest)."""
    old = tmp_path / "gen1.csv"
    new = tmp_path / "gen2.csv"
    old.write_text("id,qty\n1,5\n")
    new.write_text("id,qty,channel\n2,7,web\n")
    schema = "id long, qty int, channel string"
    df = spark.read.schema(schema).option("header", True).csv([str(old), str(new)])
    rows = {r.id: r for r in df.collect()}
    assert rows[1].channel is None
    assert rows[2].channel == "web"


def test_binary_tree_media_ingest(spark, tmp_path):
    """read_binary_tree: the raw media landing path — one row per blob
    with provenance, listing-time glob pruning (non-matching files never
    opened), recursive layout, and the max_bytes guard NULLing content
    (metadata kept) instead of dropping the row."""
    from devcontainers_etl_node_spark.sources.files import read_binary_tree

    root = tmp_path / "media"
    (root / "batch=1").mkdir(parents=True)
    (root / "batch=2").mkdir()
    (root / "batch=1" / "a.jpg").write_bytes(b"\xff\xd8\xff" + b"x" * 10)
    (root / "batch=2" / "b.jpg").write_bytes(b"\xff\xd8\xff" + b"y" * 500)
    (root / "batch=2" / "notes.txt").write_bytes(b"not media")

    df = read_binary_tree(spark, str(root), glob="*.jpg")
    rows = {r.object.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.jpg"}  # txt pruned at listing
    assert rows["a.jpg"].n_bytes == 13 and bytes(rows["a.jpg"].content)[:3] == b"\xff\xd8\xff"
    assert rows["b.jpg"].modified_at is not None

    guarded = read_binary_tree(spark, str(root), glob="*.jpg", max_bytes=100)
    g = {r.object.rsplit("/", 1)[-1]: r for r in guarded.collect()}
    assert g["a.jpg"].content is not None
    assert g["b.jpg"].content is None and g["b.jpg"].n_bytes == 503  # audit row survives


def test_webdataset_write_read_roundtrip(spark, tmp_path):
    """Tar-shard export: every doc lands exactly once under its shard,
    samples round-trip (text + json metadata), member order inside a
    shard is deterministic, and the tar BYTES are reproducible across
    two identical writes (fixed mtime/uid — rsync/content-address safe)."""
    import hashlib
    import json
    import tarfile

    from devcontainers_etl_node_spark.sinks.webdataset import write_webdataset
    from devcontainers_etl_node_spark.sources.webdataset import read_webdataset

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.pmod("id", F.lit(4)).alias("shard"),
        F.concat(F.lit("body of doc "), F.col("id")).alias("text"),
        F.concat(F.lit("lang"), F.pmod("id", F.lit(2))).alias("lang"),
    )
    for sub in ("a", "b"):
        write_webdataset(
            docs, str(tmp_path / sub), "shard", "doc_id", "text", meta_cols=["lang"]
        )

    root = tmp_path / "a"
    tars = sorted(p.name for p in root.iterdir())
    assert tars == [f"shard-{i:06d}.tar" for i in range(4)]

    # direct tarfile inspection: member order = ascending key, txt then json
    with tarfile.open(root / "shard-000001.tar") as tar:
        names = tar.getnames()
        keys = sorted(int(n.split(".")[0]) for n in names if n.endswith(".txt"))
        assert keys == [i for i in range(40) if i % 4 == 1]
        assert names == [f"{k}.{e}" for k in keys for e in ("txt", "json")]
        meta = json.loads(tar.extractfile(f"{keys[0]}.json").read())
        assert meta == {"lang": f"lang{keys[0] % 2}"}

    # byte-reproducibility across the two writes
    for t in tars:
        ha = hashlib.sha256((tmp_path / "a" / t).read_bytes()).hexdigest()
        hb = hashlib.sha256((tmp_path / "b" / t).read_bytes()).hexdigest()
        assert ha == hb, t

    # engine-side read-back conserves the corpus exactly
    back = read_webdataset(spark, str(root))
    txt = {
        int(r["key"]): bytes(r["payload"]).decode()
        for r in back.filter(F.col("ext") == "txt").collect()
    }
    assert txt == {i: f"body of doc {i}" for i in range(40)}
    assert back.count() == 80  # 40 txt + 40 json members

    # no publication litter: every surviving file is a final-name shard
    # (attempt-unique .inprogress.* temps are gone after a clean run)
    assert not [p.name for p in root.iterdir() if ".inprogress" in p.name]

    # object-store path parity: a URI root routes through the staged
    # local-scratch + pyarrow.fs upload branch; bytes must be identical
    # to the direct POSIX write, shard for shard
    write_webdataset(
        docs,
        (tmp_path / "staged").as_uri(),
        "shard",
        "doc_id",
        "text",
        meta_cols=["lang"],
    )
    for t in tars:
        ha = hashlib.sha256((tmp_path / "a" / t).read_bytes()).hexdigest()
        hs = hashlib.sha256((tmp_path / "staged" / t).read_bytes()).hexdigest()
        assert ha == hs, t


def test_webdataset_binary_members_roundtrip(spark, tmp_path):
    """r11 multimodal shards: binary_cols writes {key}.{ext} members from
    binary columns (real PNG payloads), member order stays deterministic
    (txt, sorted exts, json), a NULL payload (the max_bytes guard) skips
    only that member, text_col=None makes pure-media shards, and the
    payload bytes + decoded pixels survive the tar roundtrip exactly."""
    import hashlib
    import tarfile

    import numpy as np

    from devcontainers_etl_node_spark.operators import png
    from devcontainers_etl_node_spark.sinks.webdataset import write_webdataset
    from devcontainers_etl_node_spark.sources.webdataset import read_webdataset

    def make_png(i: int) -> bytes:
        rng = np.random.default_rng(i)
        return png.encode(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))

    rows = [(i, i % 2, f"caption {i}", make_png(i) if i != 5 else None) for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, shard LONG, text STRING, image BINARY"
    )
    for sub in ("a", "b"):
        write_webdataset(
            docs, str(tmp_path / sub), "shard", "doc_id", "text",
            binary_cols={"png": "image"},
        )
    with tarfile.open(tmp_path / "a" / "shard-000001.tar") as tar:
        names = tar.getnames()
        # doc 5's png member skipped (NULL payload), its txt still ships
        want = []
        for k in (1, 3, 5, 7):
            want.append(f"{k}.txt")
            if k != 5:
                want.append(f"{k}.png")
        assert names == want
        raw = tar.extractfile("1.png").read()
        assert raw == make_png(1)
        assert np.array_equal(
            png.decode(raw), png.decode(make_png(1))
        )
    # reproducible bytes with binary members too
    for t in ("shard-000000.tar", "shard-000001.tar"):
        ha = hashlib.sha256((tmp_path / "a" / t).read_bytes()).hexdigest()
        hb = hashlib.sha256((tmp_path / "b" / t).read_bytes()).hexdigest()
        assert ha == hb, t
    # engine-side read-back: png payloads byte-equal
    back = read_webdataset(spark, str(tmp_path / "a"))
    got = {
        int(r["key"]): bytes(r["payload"])
        for r in back.filter(F.col("ext") == "png").collect()
    }
    assert got == {i: make_png(i) for i in range(8) if i != 5}

    # pure-media shards: no .txt members when text_col is None
    write_webdataset(
        docs.filter("image IS NOT NULL"),
        str(tmp_path / "media_only"),
        "shard",
        "doc_id",
        None,
        binary_cols={"png": "image"},
    )
    with tarfile.open(tmp_path / "media_only" / "shard-000000.tar") as tar:
        assert all(n.endswith(".png") for n in tar.getnames())


def test_write_doc_store_append_guards_layout(spark, tmp_path):
    """r13 review fix: appending under a DIFFERENT n_buckets would place
    new rows where readers derive the old buckets — the manifest guard
    must refuse; a same-layout append extends the store."""
    import pytest

    from devcontainers_etl_node_spark.sinks import write_doc_store

    root = str(tmp_path / "store")
    a = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    b = spark.createDataFrame([(3, "gamma")], "doc_id long, text string")
    write_doc_store(a, root, n_buckets=8)
    with pytest.raises(ValueError, match="same layout"):
        write_doc_store(b, root, n_buckets=4, mode="append")
    write_doc_store(b, root, n_buckets=8, mode="append")
    assert spark.read.parquet(root).count() == 3


def test_write_doc_store_bucket_derivation_id_type(spark, tmp_path):
    """r14 advice fix: bucket derivation is xxhash64-TYPE-sensitive, and
    the slim verify sink hashes candidate ids as LONG — so integral ids
    are cast to long at write (int- and long-id corpora land in
    IDENTICAL buckets), the manifest records the id type, and the sink
    refuses a store whose key type cannot match instead of silently
    pruning to the wrong buckets."""
    import json

    import pytest

    from devcontainers_etl_node_spark.sinks import write_doc_store
    from devcontainers_etl_node_spark.streaming import minhash_slim_verify_sink

    rows = [(i, f"document body number {i}") for i in range(20)]
    int_docs = spark.createDataFrame(rows, "doc_id int, text string")
    long_docs = spark.createDataFrame(rows, "doc_id long, text string")
    int_root = str(tmp_path / "int_store")
    long_root = str(tmp_path / "long_store")
    write_doc_store(int_docs, int_root, n_buckets=8)
    write_doc_store(long_docs, long_root, n_buckets=8)

    def layout(root):
        df = spark.read.parquet(root)
        return {r._sid: r.bkt for r in df.select("_sid", "bkt").collect()}

    assert layout(int_root) == layout(long_root)  # same buckets, same ids
    m = json.load(open(f"{int_root}/_STORE_MANIFEST.json"))
    assert m["id_type"] == "long"
    # the sink accepts a long-keyed store...
    minhash_slim_verify_sink(long_root, str(tmp_path / "out"))

    # ...and refuses a string-keyed one at construction
    str_docs = spark.createDataFrame(
        [(str(i), f"document body number {i}") for i in range(5)],
        "doc_id string, text string",
    )
    str_root = str(tmp_path / "str_store")
    write_doc_store(str_docs, str_root, n_buckets=8)
    assert json.load(open(f"{str_root}/_STORE_MANIFEST.json"))["id_type"] == "string"
    with pytest.raises(ValueError, match="type-sensitive"):
        minhash_slim_verify_sink(str_root, str(tmp_path / "out2"))

    # pre-r14 manifests (no id_type): the ORIGINAL bucket rule is
    # unknowable (an int-keyed store's rows sit in xxhash64(int)
    # buckets), so appends REFUSE instead of assuming long and
    # re-stamping a possibly mixed-derivation store as sound
    m.pop("id_type")
    json.dump(m, open(f"{int_root}/_STORE_MANIFEST.json", "w"))
    with pytest.raises(ValueError, match="pre-r14"):
        write_doc_store(
            spark.createDataFrame([(99, "late arrival")], "doc_id int, text string"),
            int_root,
            n_buckets=8,
            mode="append",
        )
    # ...and the READ path refuses it too (r14 review fix): assuming
    # long would let an int-keyed pre-r14 store pass construction and
    # silently prune the wrong buckets — zero pairs, no error
    with pytest.raises(ValueError, match="pre-r14"):
        minhash_slim_verify_sink(int_root, str(tmp_path / "out3"))
    # a rewrite re-buckets everything under the current layout
    write_doc_store(int_docs, int_root, n_buckets=8, mode="overwrite")
    assert json.load(open(f"{int_root}/_STORE_MANIFEST.json"))["id_type"] == "long"
