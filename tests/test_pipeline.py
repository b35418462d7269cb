"""The reference's flagship ETL path end-to-end on generated data:
generators (G1-G5) → star-schema transform (P1/P2 + J1/J2) → conformed
sink schemas (K2), plus the Kafka serialization round-trip (F10/F11)."""

from __future__ import annotations

from devcontainers_etl_node_spark import schemas
from devcontainers_etl_node_spark.generators import (
    gen_customers,
    gen_inventory_snapshots,
    gen_products,
    gen_sales_events,
    seed_to_minimum,
)
from devcontainers_etl_node_spark.pipeline import transform_star_schema
from devcontainers_etl_node_spark.sinks.kafka import to_kafka_records
from devcontainers_etl_node_spark.sources.kafka import parse_event_stream
from devcontainers_etl_node_spark.transforms.conform import conform


def test_generators_shapes(spark):
    prods = gen_products(spark, 30)
    custs = gen_customers(spark, 20)
    assert prods.count() == 30
    assert custs.count() == 20
    p = prods.collect()[0]
    assert p.sku.startswith("SKU-")
    assert p.category in {"electronics", "toys", "sports", "books", "home"}
    assert float(p.price) >= 9.99
    ev = gen_sales_events(spark, 50, prods, custs)
    assert ev.count() == 50
    e = ev.collect()[0]
    assert 1 <= e.qty <= 4
    assert e.unit_price is not None
    inv = gen_inventory_snapshots(spark, prods, warehouses=2, days=14, step_days=7)
    # 2 warehouses × 2 dates × 30 products
    assert inv.count() == 2 * 2 * 30


def test_generators_deterministic(spark):
    a = {(r.product_id, r.sku) for r in gen_products(spark, 10, seed=7).collect()}
    b = {(r.product_id, r.sku) for r in gen_products(spark, 10, seed=7).collect()}
    c = {(r.product_id, r.sku) for r in gen_products(spark, 10, seed=8).collect()}
    assert a == b
    assert a != c


def test_seed_to_minimum(spark):
    few = gen_products(spark, 5)
    seeded = seed_to_minimum(few, spark, min_count=25)
    assert seeded.count() == 25
    assert seed_to_minimum(seeded, spark, min_count=25).count() == 25


def test_star_schema_pipeline(spark):
    prods = gen_products(spark, 25).withColumnRenamed("product_id", "id").withColumnRenamed(
        "product_name", "name"
    )
    custs = gen_customers(spark, 15).withColumnRenamed("customer_id", "id")
    events = gen_sales_events(
        spark,
        40,
        gen_products(spark, 25),
        gen_customers(spark, 15),
    )
    inv = gen_inventory_snapshots(spark, gen_products(spark, 25), warehouses=2, days=7)
    inv = inv.withColumn("object", inv.warehouse_id)

    tables = transform_star_schema(prods, custs, events, inv)
    assert set(tables) == {"dim_products", "dim_customers", "fact_sales", "fact_inventory"}

    fact = tables["fact_sales"]
    # enrichment columns present and joined (J1+J2)
    for c in ["external_id", "customer_name", "segment", "sku", "product_name", "category"]:
        assert c in fact.columns
    rows = fact.collect()
    assert len(rows) == 40
    assert all(r.customer_name is not None for r in rows)  # all ids resolve

    # K2: conform the fact to the declared sink schema
    conformed = conform(fact, schemas.FACT_SALES)
    assert [f.name for f in conformed.schema.fields] == [f.name for f in schemas.FACT_SALES.fields]
    assert conformed.count() == 40


def test_kafka_serialization_roundtrip(spark):
    """F11 producer encode → F10 consumer decode recovers the event."""
    prods, custs = gen_products(spark, 10), gen_customers(spark, 10)
    events = gen_sales_events(spark, 20, prods, custs).select(
        "event_id",
        "ts",
        "customer_id",
        "product_id",
        "qty",
        "unit_price",
    )
    wire = to_kafka_records(events)
    assert wire.columns == ["key", "value"]
    back = parse_event_stream(wire)
    rows = back.collect()
    assert len(rows) == 20
    orig = {r.event_id: r for r in events.collect()}
    for r in rows:
        assert r.qty == orig[r.event_id].qty
        assert abs(r.unit_price - float(orig[r.event_id].unit_price)) < 1e-9


def test_observe_pipeline_metrics(spark):
    """df.observe(): data-quality counters (row count, join-miss count,
    revenue total) accumulated DURING the enrichment pass — zero extra
    scans or actions, which is the only affordable way to instrument a
    100 TB pipeline (a separate count()/filter().count() audit would
    re-read the fact twice). Metrics arrive on the driver with the
    action's completion."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    prods = gen_products(spark, 25).withColumnRenamed("product_id", "id").withColumnRenamed(
        "product_name", "name"
    )
    custs = gen_customers(spark, 15).withColumnRenamed("customer_id", "id")
    events = gen_sales_events(
        spark, 40, gen_products(spark, 25), gen_customers(spark, 15)
    )
    inv = gen_inventory_snapshots(spark, gen_products(spark, 25), warehouses=2, days=2)
    inv = inv.withColumn("object", inv.warehouse_id)

    fact = transform_star_schema(prods, custs, events, inv)["fact_sales"]
    obs = Observation("quality")
    observed = fact.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("customer_name").isNull(), 1).otherwise(0)).alias("join_misses"),
        F.sum(F.col("qty")).alias("total_qty"),
    )
    n_collected = observed.count()  # one action drives both result and metrics
    got = obs.get
    assert got["n_rows"] == n_collected == 40
    assert got["join_misses"] == 0
    assert got["total_qty"] > 0


def test_cli_list_and_run(spark, capsys):
    """The CLI front door: `list` enumerates the catalog; `run` executes
    a query through the same registry the driver uses."""
    from devcontainers_etl_node_spark import cli

    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "SQL  pricing_summary" in out
    assert cli.main(["run", "nope"]) == 2
    assert (
        cli.main(["run", "row_counts", "--sf", "/root/testdata/sf0.001", "--rows", "3"])
        == 0
    )
    assert "row" in capsys.readouterr().out.lower()


def test_cli_dedup_plan(capsys):
    """dedup-plan (r11): prints the geometry JSON; past the floor
    crossover it warns toward blocking; an unreachable recall exits 2."""
    import json

    from devcontainers_etl_node_spark import cli

    assert cli.main(["dedup-plan", "--threshold", "0.5", "--recall", "0.4"]) == 0
    out, err = capsys.readouterr()
    g = json.loads(out)
    assert g["rows_per_band"] >= 4 and not err

    assert (
        cli.main(
            ["dedup-plan", "--threshold", "0.5", "--recall", "0.4", "--docs", "1e9"]
        )
        == 0
    )
    _, err = capsys.readouterr()
    assert "floor crossover" in err and "block_cols" in err

    assert (
        cli.main(
            ["dedup-plan", "--threshold", "0.2", "--recall", "0.99", "--max-hashes", "16"]
        )
        == 2
    )
    _, err = capsys.readouterr()
    assert "no geometry" in err

    # --blocks: balanced blocking scales the crossover out by B exactly
    assert cli.main(["dedup-plan", "--threshold", "0.5", "--recall", "0.4"]) == 0
    base = json.loads(capsys.readouterr()[0])
    assert (
        cli.main(
            ["dedup-plan", "--threshold", "0.5", "--recall", "0.4", "--blocks", "10"]
        )
        == 0
    )
    blocked = json.loads(capsys.readouterr()[0])
    assert blocked["floor_crossover_docs"] == base["floor_crossover_docs"] * 10


def test_cli_export_writes_reproducible_shards(spark, tmp_path, capsys):
    """`export` — the last mile: token_shard_assign → write_webdataset.
    Shards exist under --out, every doc lands exactly once, and two runs
    of the same corpus + budget produce byte-identical tars (sha256)."""
    import hashlib
    import tarfile

    from devcontainers_etl_node_spark import cli

    for sub in ("a", "b"):
        assert (
            cli.main(
                [
                    "export",
                    "--sf",
                    "/root/testdata/sf0.001",
                    "--out",
                    str(tmp_path / sub),
                    "--tokens-per-shard",
                    "2048",
                ]
            )
            == 0
        )
    shards = sorted(p.name for p in (tmp_path / "a").iterdir())
    assert shards and all(s.startswith("shard-") and s.endswith(".tar") for s in shards)
    assert sorted(p.name for p in (tmp_path / "b").iterdir()) == shards
    for s in shards:
        ha = hashlib.sha256((tmp_path / "a" / s).read_bytes()).hexdigest()
        hb = hashlib.sha256((tmp_path / "b" / s).read_bytes()).hexdigest()
        assert ha == hb, s
    # corpus conservation: every non-empty doc appears exactly once
    keys = []
    for s in shards:
        with tarfile.open(tmp_path / "a" / s) as tar:
            keys += [n[: -len(".txt")] for n in tar.getnames() if n.endswith(".txt")]
    assert len(keys) == len(set(keys))
    import duckdb

    n_docs = duckdb.connect().execute(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchone()[0]
    assert len(keys) == n_docs


def test_pandas_api_migration_parity(spark):
    """Migration bridge: the reference's literal pandas call shape
    (rename + two chained left merges, src/etl/etl.py:20-54) runs
    UNCHANGED on pyspark.pandas and produces exactly the engine's
    DataFrame-path enrichment — the path a reference user takes on day
    one, before rewriting anything, with Catalyst underneath either way."""
    import pyspark.pandas as ps
    from pyspark.sql import functions as F

    prods = gen_products(spark, 25)
    custs = gen_customers(spark, 15)
    events = gen_sales_events(spark, 40, prods, custs)

    # --- reference call shape, pandas API on Spark --------------------
    p = prods.pandas_api().rename(columns={"product_id": "id", "product_name": "name"})
    c = custs.pandas_api().rename(columns={"customer_id": "id"})
    ev = events.pandas_api()
    dim_c = c.rename(columns={"id": "customer_id", "name": "customer_name"})[
        ["customer_id", "external_id", "customer_name", "segment"]
    ]
    dim_p = p.rename(columns={"id": "product_id", "name": "product_name"})[
        ["product_id", "sku", "product_name", "category"]
    ]
    with ps.option_context("compute.ops_on_diff_frames", True):
        fact_ps = ev.merge(dim_c, on="customer_id", how="left").merge(
            dim_p, on="product_id", how="left"
        )

    # --- engine DataFrame path ---------------------------------------
    tables = transform_star_schema(
        prods.withColumnRenamed("product_id", "id").withColumnRenamed("product_name", "name"),
        custs.withColumnRenamed("customer_id", "id"),
        events,
        gen_inventory_snapshots(spark, prods, warehouses=1, days=1).withColumn(
            "object", F.lit("x")
        ),
    )
    cols = ["event_id", "customer_name", "segment", "sku", "product_name", "category"]
    got = sorted(map(tuple, fact_ps.to_pandas()[cols].itertuples(index=False)))
    expected = sorted(map(tuple, tables["fact_sales"].select(*cols).toPandas().itertuples(index=False)))
    assert got == expected


def test_cli_dedup_table_feed_and_table_maintenance(spark, tmp_path, capsys):
    """`dedup --table` consumes a txlog corpus change feed (no --new/--old
    bookkeeping); `table history|compact|vacuum` drive the maintenance
    surface."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog

    corpus = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    base = "the quick brown fox jumps over the lazy dog tonight " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("lazy", "sleepy"))]
        + [(10 + i, f"cli filler doc {i} with words {i * 17}") for i in range(6)],
        ["doc_id", "text"],
    )
    txlog.tx_write(docs, corpus)  # v0
    assert cli.main(["dedup", "--table", corpus, "--work", work]) == 0
    assert "snapshot v1 committed" in capsys.readouterr().err

    # unchanged corpus -> explicit no-op
    assert cli.main(["dedup", "--table", corpus, "--work", work]) == 0
    assert "nothing to do" in capsys.readouterr().err

    # append a batch -> only the new batch is processed
    txlog.tx_write(
        docs.filter(F.col("doc_id") == 1).withColumn(
            "doc_id", F.lit(100).cast("long")
        ),
        corpus,
    )
    assert cli.main(["dedup", "--table", corpus, "--work", work]) == 0
    assert "snapshot v2 committed" in capsys.readouterr().err

    # neither --table nor --new is an argument error, not a crash
    assert cli.main(["dedup", "--work", work]) == 2

    assert cli.main(["table", "history", corpus]) == 0
    hist = capsys.readouterr().out
    assert "v0" in hist and "v1" in hist
    assert cli.main(["table", "compact", corpus]) == 0
    assert cli.main(["table", "vacuum", corpus, "--retention-hours", "0"]) == 0
    assert cli.main(["table", "history", str(tmp_path / "missing")]) == 1


def test_cli_table_merge_upserts_by_key(spark, tmp_path, capsys):
    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog

    corpus = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id LONG, text STRING"
    )
    txlog.tx_write(docs, corpus)

    updates = str(tmp_path / "updates")
    spark.createDataFrame(
        [(3, "REWRITTEN"), (42, "INSERTED")], "doc_id LONG, text STRING"
    ).write.parquet(updates)

    assert cli.main(["table", "merge", corpus, "--updates", updates, "--key", "doc_id"]) == 0
    assert "merged -> v1" in capsys.readouterr().err
    got = {r["doc_id"]: r["text"] for r in txlog.tx_read(spark, corpus).collect()}
    assert got[3] == "REWRITTEN" and got[42] == "INSERTED" and len(got) == 11

    # missing required flags is an argument error, not a crash
    assert cli.main(["table", "merge", corpus]) == 2


def test_cli_table_restore(spark, tmp_path, capsys):
    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog

    corpus = str(tmp_path / "corpus")
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)], "doc_id LONG, text STRING")
    txlog.tx_write(docs, corpus)                                          # v0
    txlog.tx_write(docs.limit(1), corpus, mode="overwrite")               # v1 (bad)
    assert cli.main(["table", "restore", corpus, "--to-version", "0"]) == 0
    assert "restored v0 -> v2" in capsys.readouterr().err
    assert txlog.tx_read(spark, corpus).count() == 8
    assert cli.main(["table", "restore", corpus]) == 2  # missing flag


def test_gen_documents_zipf_is_deterministic_zipfian_and_family_structured(spark):
    """The scale-ladder corpus generator (generators/synthetic.py): full
    documents schema, deterministic in its seed, Zipf-headed token
    frequencies (top word ~10x the 100th), and 4-member near-dup
    families whose members share their boilerplate but not their tails."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.generators.synthetic import gen_documents_zipf

    docs = gen_documents_zipf(spark, 2000, seed=7)
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert docs.count() == 2000
    # deterministic: same args -> identical corpus
    again = gen_documents_zipf(spark, 2000, seed=7)
    assert (
        docs.exceptAll(again).count() == 0 and again.exceptAll(docs).count() == 0
    )
    # different seed -> different corpus
    other = gen_documents_zipf(spark, 2000, seed=8)
    assert docs.exceptAll(other).count() > 0
    # Zipf head: the most frequent token dwarfs the 100th most frequent
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc())
        .limit(100)
        .collect()
    )
    assert freq[0]["count"] > 5 * freq[99]["count"]
    # family structure: docs 0-3 share one family, 4-7 another
    texts = {r.doc_id: r.text for r in docs.filter("doc_id < 8").collect()}
    fam0 = {frozenset(texts[i].split()[:38]) for i in range(4)}
    fam1 = {frozenset(texts[i].split()[:38]) for i in range(4, 8)}
    assert len(fam0) == 1 and len(fam1) == 1 and fam0 != fam1
    assert len({texts[i] for i in range(4)}) == 4  # tails differ
    # langs roughly 60/30/10
    langs = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(langs) == {"en", "de", "fr"} and langs["en"] > langs["de"] > langs["fr"]


def test_cli_table_export_open_formats(spark, tmp_path, capsys):
    """`table export-delta` / `table export-iceberg`: one command turns a
    txlog table into both open formats in place; replays match the
    manifest."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.sinks.delta_export import delta_log_snapshot
    from devcontainers_etl_node_spark.sinks.iceberg_export import iceberg_snapshot

    root = str(tmp_path / "t")
    txlog.tx_write(
        spark.range(0, 7).select(F.col("id"), F.lit("x").alias("b")), root
    )
    assert cli.main(["table", "export-delta", root]) == 0
    assert cli.main(["table", "export-iceberg", root]) == 0
    assert sum(
        f["numRecords"] for f in delta_log_snapshot(root)["files"].values()
    ) == 7
    assert sum(
        f["records"] for f in iceberg_snapshot(root)["files"].values()
    ) == 7


def test_cli_dedup_plan_partition_sizing(capsys):
    """r13 (the 4M-rung lesson as planner output): --docs adds the
    partition-sizing recommendation — shuffle partitions scale ~n/20k
    (never below the 32 floor), and --avg-doc-bytes sizes scan splits to
    ~20k docs, clamped to [4 MB, 128 MB]."""
    import json

    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.operators.dedup import minhash_partition_plan

    # the rule scales with n: 10x the docs -> 10x the partitions
    assert minhash_partition_plan(4_000_000)["shuffle_partitions"] == 200
    assert minhash_partition_plan(40_000_000)["shuffle_partitions"] == 2000
    assert minhash_partition_plan(1000)["shuffle_partitions"] == 32  # floor
    # split sizing: 2 KB docs -> 40 MB splits; tiny docs clamp at 4 MB,
    # huge docs clamp at the 128 MB Spark default
    assert minhash_partition_plan(10**6, avg_doc_bytes=2048)[
        "max_partition_bytes"
    ] == 2048 * 20_000
    assert minhash_partition_plan(10**6, avg_doc_bytes=10)["max_partition_bytes"] == 4 << 20
    assert minhash_partition_plan(10**6, avg_doc_bytes=10**6)[
        "max_partition_bytes"
    ] == 128 << 20

    assert (
        cli.main(
            [
                "dedup-plan", "--threshold", "0.5", "--recall", "0.4",
                "--docs", "4e6", "--avg-doc-bytes", "2048",
            ]
        )
        == 0
    )
    out, err = capsys.readouterr()
    g = json.loads(out)
    assert g["partitioning"]["shuffle_partitions"] == 200
    assert g["partitioning"]["max_partition_bytes"] == 2048 * 20_000
    assert "spark.sql.shuffle.partitions=200" in err
    # r14: --avg-doc-bytes also sizes the bucketed store (~64 MB bucket
    # files after compaction: 2 B/char * 4e6 * 2048 / 64 MB = 244)
    assert g["store_buckets"] == 244
    assert "store_buckets=244" in err
    # r14 (verdict task 5): the blocking rule rides EVERY --docs
    # invocation, not just past-crossover refusals
    assert "family-consistent key" in err
    assert "candidates/doc" in err
    import pytest

    with pytest.raises(ValueError):
        minhash_partition_plan(0)


def test_applied_partition_plan_scoped_set_then_restore(spark):
    """r14 (closing the r13 `weak`): the partition-sizing rule is now an
    applicable CONTEXT — scope-set, restored after (also on error), and
    MONOTONE toward finer tasks: it never lowers the session's shuffle
    partitions nor raises its scan-split size."""
    import pytest

    from devcontainers_etl_node_spark.operators.dedup import applied_partition_plan

    orig_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    orig_split = spark.conf.get("spark.sql.files.maxPartitionBytes")

    with applied_partition_plan(spark, 4_000_000, avg_doc_bytes=2048) as plan:
        # the conf values scale with n: 4M docs -> n/20k = 200 partitions,
        # 2 KB docs -> ~40 MB splits
        assert plan["shuffle_partitions"] == 200
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(2048 * 20_000)
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig_shuffle
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == orig_split

    # MONOTONE: the plan never LOWERS a finer session shuffle setting and
    # never RAISES the session's split size (a >=128 MB recommendation is
    # a no-op against the 128 MB default)
    spark.conf.set("spark.sql.shuffle.partitions", "4096")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8388608")
    try:
        with applied_partition_plan(spark, 1000, avg_doc_bytes=100_000_000):
            # plan says 32 partitions / 128 MB splits; session is finer
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4096"
            assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "8388608"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", orig_split)

    # restore must survive a failure inside the scope (budget refusals)
    with pytest.raises(RuntimeError, match="boom"):
        with applied_partition_plan(spark, 4_000_000, avg_doc_bytes=2048):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig_shuffle
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == orig_split


def test_parse_byte_conf_grammar():
    from devcontainers_etl_node_spark.operators.dedup import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 128 << 20
    assert _parse_byte_conf("134217728b") == 128 << 20
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128mb") == 128 << 20
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("64k") == 64 << 10


def test_cli_dedup_pins_block_choice_per_workdir(tmp_path):
    """r13 review fix + r14 advice fix: the dedup CLI records the
    resolved block key in the workdir AFTER a successful run; a later
    run that resolves (or passes) a different key fails loudly instead
    of silently flipping the pair-set contract — and a FAILED first run
    (budget refusal, missing corpus) leaves NO pin, so it cannot
    permanently commit a contract the user never established."""
    import os

    import pytest

    from devcontainers_etl_node_spark.cli import _check_block_pin

    import json

    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    # check writes only a write-ahead INTENT until commit() — the
    # failed-run path never commits, and with no snapshot committed the
    # next check discards the intent (r14: the intent also closes the
    # kill window between snapshot commit and commit_pin)
    block, commit = _check_block_pin(wd, ["lang", "source"])
    assert block == ["lang", "source"]
    assert isinstance(json.load(open(os.path.join(wd, "_BLOCK.json"))), dict)
    # a "failed" first run: no commit — a different key is still allowed
    block2, commit2 = _check_block_pin(wd, ["lang"])
    assert block2 == ["lang"]
    commit2()  # the successful run pins ITS key
    assert json.load(open(os.path.join(wd, "_BLOCK.json"))) == ["lang"]
    # same key re-checks fine; a different one now fails loudly
    _check_block_pin(wd, ["lang"])
    with pytest.raises(SystemExit, match="committed block key"):
        _check_block_pin(wd, ["lang", "source"])
    with pytest.raises(SystemExit, match="committed block key"):
        _check_block_pin(wd, None)


def test_cli_block_pin_intent_promotion_is_narrow(tmp_path):
    """r14 review fix: a leftover write-ahead intent is promoted only
    when the snapshot pointer sits EXACTLY at the version the intent
    named AND, where the manifest records the block key as a layout
    property (bucketed stores), the committed key agrees. A pin-unaware
    library run (`run_incremental_dedup` directly) that commits versions
    after a refused/crashed CLI run must not inherit the stale key as a
    pin the committed history was never built with."""
    import json
    import os

    from devcontainers_etl_node_spark.cli import _check_block_pin
    from devcontainers_etl_node_spark.incremental import _commit_current

    # 1) foreign commits drove the pointer PAST the intent's version:
    # the intent's provenance is unknowable — discard, don't promote
    wd = str(tmp_path / "past")
    os.makedirs(wd)
    pin = os.path.join(wd, "_BLOCK.json")
    with open(pin, "w") as f:
        json.dump({"key": ["lang"], "for_version": 1}, f)
    _commit_current(wd, 2)
    block, _commit = _check_block_pin(wd, ["lang", "source"])
    assert block == ["lang", "source"]  # not refused: stale intent gone
    assert isinstance(json.load(open(pin)), dict)  # fresh intent, no pin

    # 2) pointer at the intent's exact version, but the bucketed
    # manifest records a DIFFERENT committed key: discard
    wd2 = str(tmp_path / "mismatch")
    os.makedirs(wd2)
    pin2 = os.path.join(wd2, "_BLOCK.json")
    with open(pin2, "w") as f:
        json.dump({"key": ["lang"], "for_version": 1}, f)
    _commit_current(wd2, 1)
    with open(os.path.join(wd2, "_MANIFEST.json"), "w") as f:
        json.dump({"store_buckets": 8, "block_cols": ["source"]}, f)
    block2, _commit2 = _check_block_pin(wd2, ["source"])
    assert block2 == ["source"]  # the manifest's key passes

    # 3) the genuine kill-window case still promotes: pointer exactly at
    # the intent's version, manifest agrees (or is legacy/silent)
    wd3 = str(tmp_path / "promote")
    os.makedirs(wd3)
    pin3 = os.path.join(wd3, "_BLOCK.json")
    with open(pin3, "w") as f:
        json.dump({"key": ["lang"], "for_version": 1}, f)
    _commit_current(wd3, 1)
    import pytest

    with pytest.raises(SystemExit, match="committed block key"):
        _check_block_pin(wd3, ["source"])
    assert json.load(open(pin3)) == ["lang"]  # promoted to a plain pin


def test_cli_dedup_failed_run_leaves_no_pin(spark, tmp_path):
    """r14 advice fix, CLI-level: a budget-gate refusal must not pin the
    block key — the workdir stays uncommitted, and a later informed run
    (budget disabled) succeeds and records ITS contract."""
    import os

    import pytest

    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog

    corpus = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    template = "terms of service apply to all content without exception " * 4
    docs = spark.createDataFrame(
        [(i, template + f"tail {i}") for i in range(80)], ["doc_id", "text"]
    )
    txlog.tx_write(docs, corpus)
    with pytest.raises(ValueError, match="pre-flight budget exceeded"):
        cli.main(["dedup", "--table", corpus, "--work", work])
    # the failed run leaves at most an unpromoted write-ahead INTENT, not
    # a pin: a later run with a different key is still allowed
    import json

    pin_path = os.path.join(work, "_BLOCK.json")
    if os.path.exists(pin_path):
        assert isinstance(json.load(open(pin_path)), dict)  # intent, not pin
    # informed opt-out now succeeds and pins the (unblocked) contract
    assert cli.main(["dedup", "--table", corpus, "--work", work, "--budget", "0"]) == 0
    assert json.load(open(pin_path)) == []


def test_cli_curate_cross_block_recovery_flag(tmp_path, capsys):
    """r14: the curate CLI plumbs --cross-block-recovery into the staged
    funnel (full run at sf0.001; the API-level semantics are pinned in
    tests/test_funnel.py)."""
    from devcontainers_etl_node_spark import cli

    assert (
        cli.main(
            [
                "curate", "--sf", "/root/testdata/sf0.001",
                "--work", str(tmp_path / "wd"), "--cross-block-recovery",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "near_dedup" in out and "packed" in out


def test_cli_dedup_bucketed_store_flags(spark, tmp_path, capsys):
    """r14: `dedup --store-buckets N` runs the bucketed delta layout
    through the change feed — sig/shingle deltas land as _bkt-partitioned
    dirs, a second append never needs --old, and the implied
    persist_shingles joins the manifest contract (a later run without the
    flag fails loudly)."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark import cli
    from devcontainers_etl_node_spark.sinks import txlog

    corpus = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    base = "the quick brown fox jumps over the lazy dog tonight " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("lazy", "sleepy"))]
        + [(10 + i, f"cli filler doc {i} with words {i * 17}") for i in range(6)],
        ["doc_id", "text"],
    )
    txlog.tx_write(docs, corpus)
    args = ["dedup", "--table", corpus, "--work", work, "--store-buckets", "8"]
    assert cli.main(args) == 0
    assert "snapshot v1 committed" in capsys.readouterr().err
    d = os.path.join(work, "sigs_b1")
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert "_bkt" in spark.read.parquet(d).columns  # plain delta, bucket column
    assert not os.path.exists(os.path.join(work, "sigs_v1"))

    txlog.tx_write(
        docs.filter(F.col("doc_id") == 1).withColumn(
            "doc_id", F.lit(100).cast("long")
        ),
        corpus,
    )
    assert cli.main(args) == 0
    assert "snapshot v2 committed" in capsys.readouterr().err
    assert os.path.exists(os.path.join(work, "shingles_b2", "_SUCCESS"))

    # dropping the flag mid-cadence = a different snapshot contract
    # (needs an unconsumed append — an unchanged corpus no-ops before
    # the manifest is ever read)
    txlog.tx_write(
        docs.filter(F.col("doc_id") == 2).withColumn(
            "doc_id", F.lit(101).cast("long")
        ),
        corpus,
    )
    with pytest.raises(ValueError, match="was built with"):
        cli.main(["dedup", "--table", corpus, "--work", work])
