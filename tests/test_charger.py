"""G6 continuous generator fleet: two cycles must append monotonically
across all three sinks, and a restarted fleet must resume (not restart)
the cycle numbering — reference src/data_chargers/load.py semantics."""

from devcontainers_etl_node_spark.config import EngineConfig
from devcontainers_etl_node_spark.generators.charger import ChargerPaths, run_chargers


def _cfg(magnitude: int = 20) -> EngineConfig:
    cfg = EngineConfig()
    cfg.interval_seconds = 0  # no sleeping in tests
    cfg.magnitude_order = magnitude
    return cfg


def test_two_cycles_append_monotonically(spark, tmp_path):
    root = str(tmp_path / "charger")
    paths = ChargerPaths(root)

    history = run_chargers(spark, root, cycles=1, config=_cfg())
    assert len(history) == 1
    p1 = spark.read.parquet(paths.products).count()
    c1 = spark.read.parquet(paths.customers).count()
    s1 = spark.read.json(paths.sales_topic).count()
    i1 = spark.read.option("header", True).csv(paths.inventory).count()
    assert p1 >= 10 and c1 >= 10  # seeded to minimum
    assert s1 == 20
    assert i1 == 3 * p1  # one snapshot row per (warehouse, product)

    history = run_chargers(spark, root, cycles=1, config=_cfg())
    p2 = spark.read.parquet(paths.products).count()
    c2 = spark.read.parquet(paths.customers).count()
    s2 = spark.read.json(paths.sales_topic).count()
    i2 = spark.read.option("header", True).csv(paths.inventory).count()
    assert p2 > p1 and c2 > c1
    assert s2 == s1 + 20
    assert i2 == i1 + 3 * p2  # cycle-2 snapshot covers the grown catalog


def test_ids_monotonic_and_cycles_resume(spark, tmp_path):
    root = str(tmp_path / "charger2")
    paths = ChargerPaths(root)
    run_chargers(spark, root, cycles=2, config=_cfg(magnitude=5))

    products = spark.read.parquet(paths.products)
    ids = [r.product_id for r in products.select("product_id").collect()]
    assert len(ids) == len(set(ids)), "autoincrement twin must never reuse ids"
    assert min(ids) == 1 and max(ids) == len(ids), "ids are contiguous from 1"

    # restart: cycle numbering resumes from the topic high-water mark
    topic = spark.read.json(paths.sales_topic)
    assert set(r.cycle for r in topic.select("cycle").distinct().collect()) == {0, 1}
    run_chargers(spark, root, cycles=1, config=_cfg(magnitude=5))
    topic = spark.read.json(paths.sales_topic)
    assert set(r.cycle for r in topic.select("cycle").distinct().collect()) == {0, 1, 2}


def test_inventory_date_advances_per_cycle(spark, tmp_path):
    root = str(tmp_path / "charger3")
    paths = ChargerPaths(root)
    run_chargers(spark, root, cycles=3, config=_cfg(magnitude=5))
    inv = spark.read.option("header", True).csv(paths.inventory)
    dates = sorted(r.date for r in inv.select("date").distinct().collect())
    assert dates == ["2024-01-01", "2024-01-02", "2024-01-03"]


def test_sales_records_are_kafka_wire_format(spark, tmp_path):
    root = str(tmp_path / "charger4")
    run_chargers(spark, root, cycles=1, config=_cfg(magnitude=5))
    topic = spark.read.json(ChargerPaths(root).sales_topic)
    assert set(topic.columns) == {"key", "value", "cycle"}
    row = topic.first()
    import json

    payload = json.loads(row.value)
    assert payload["event_id"] == row.key
    assert {"event_id", "ts", "customer_id", "product_id", "qty", "unit_price"} <= set(payload)


def test_stream_charger_exactly_once_across_restart(spark, tmp_path):
    """The streaming fleet twin: a capped stream emits exactly max_rows
    wire-format records; restarting with a HIGHER cap resumes from the
    checkpointed offset — no duplicates, no gaps."""
    from devcontainers_etl_node_spark.generators.charger import ChargerPaths, stream_chargers

    root = str(tmp_path / "scharger")
    ckpt = str(tmp_path / "ckpt")
    q = stream_chargers(spark, root, ckpt, rows_per_batch=20, max_rows=50)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    topic = spark.read.json(ChargerPaths(root).sales_topic)
    keys1 = sorted(int(r.key) for r in topic.select("key").collect())
    assert keys1 == list(range(50))

    q = stream_chargers(spark, root, ckpt, rows_per_batch=20, max_rows=90)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    topic = spark.read.json(ChargerPaths(root).sales_topic)
    keys2 = sorted(int(r.key) for r in topic.select("key").collect())
    assert keys2 == list(range(90))  # resumed at 50, not re-emitted
