"""G6: the continuous generator fleet (reference ``src/data_chargers/load.py:5-40``).

The reference launches three producer *processes* (postgres_loader,
kafka_loader, minio_loader), each an infinite ``while True: emit; sleep
(INTERVAL_SECONDS)`` loop against live infrastructure. The Spark-native
twin runs the same three producers as concurrent *jobs on one session*
(Spark's scheduler interleaves them across the executor pool — the
in-engine analogue of the process fleet) against lakehouse sinks:

- **catalog producer** (postgres twin): appends new products + customers
  to parquet tables, ids continuing monotonically from what exists
  (the reference's autoincrement), seeding the catalog to a minimum on
  the first cycle (``ensure_min_products``, postgres_loader.py:79-86);
- **sales producer** (kafka twin): serializes events through
  ``to_kafka_records`` (the exact wire format) and appends the
  (key, value) records to a JSON-lines topic directory;
- **inventory producer** (minio twin): writes one per-warehouse CSV
  snapshot tree per cycle, the date pointer advancing ``step_days`` per
  cycle (minio_loader.py:101-123).

Each cycle is one batch; ``interval_seconds`` sleeps between cycles
(0 in tests). State (id high-water marks, the date pointer) is read from
the sinks themselves, so the fleet is restartable — parity with the
reference, whose producers recover position from Postgres/the bucket.

Scale: every per-cycle batch is a normal parquet/CSV append job —
magnitude_order can be 10 (reference parity) or 10^8; the id high-water
read is a parquet-footer max() aggregate, not a table scan.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from devcontainers_etl_node_spark.config import DEFAULT, EngineConfig
from devcontainers_etl_node_spark.generators.synthetic import (
    gen_customers,
    gen_inventory_snapshots,
    gen_products,
    gen_sales_events,
)
from devcontainers_etl_node_spark.sinks.files import write_inventory_tree
from devcontainers_etl_node_spark.sinks.kafka import to_kafka_records


@dataclass
class ChargerPaths:
    root: str

    @property
    def products(self) -> str:
        return f"{self.root}/products"

    @property
    def customers(self) -> str:
        return f"{self.root}/customers"

    @property
    def sales_topic(self) -> str:
        return f"{self.root}/sales_topic"

    @property
    def inventory(self) -> str:
        return f"{self.root}/inventory"


def _existing_max(spark: SparkSession, path: str, id_col: str) -> int:
    """High-water mark of an append table; 0 if the table doesn't exist yet.
    max() over parquet resolves from footer statistics — no data scan."""
    try:
        row = spark.read.parquet(path).agg(F.max(id_col)).first()
        return int(row[0]) if row and row[0] is not None else 0
    except AnalysisException:  # path does not exist yet (first cycle)
        return 0


def _shift_ids(df: DataFrame, id_col: str, offset: int) -> DataFrame:
    return df.withColumn(id_col, (F.col(id_col) + F.lit(offset)).cast("long"))


def run_cycle(
    spark: SparkSession,
    paths: ChargerPaths,
    cycle: int,
    magnitude: int = 10,
    seed: int = 42,
    min_products: int = 10,
    warehouses: int = 3,
    start_date: str = "2024-01-01",
    step_days: int = 1,
) -> dict[str, int]:
    """One fleet cycle: the three producers submitted concurrently.

    Returns per-sink appended row counts (the reference prints these
    per-loop — postgres_loader.py:103-118)."""
    prod_hwm = _existing_max(spark, paths.products, "product_id")
    cust_hwm = _existing_max(spark, paths.customers, "customer_id")

    # postgres twin: seed to minimum on an empty catalog, then a trickle of
    # new rows per cycle (reference inserts 1-3 rows + seeds to 10).
    n_new_prod = max(min_products - prod_hwm, 0) or max(magnitude // 5, 1)
    n_new_cust = max(min_products - cust_hwm, 0) or max(magnitude // 5, 1)
    new_products = _shift_ids(
        gen_products(spark, n_new_prod, seed=seed + cycle), "product_id", prod_hwm
    )
    new_customers = _shift_ids(
        gen_customers(spark, n_new_cust, seed=seed + cycle), "customer_id", cust_hwm
    )

    def write_catalog() -> int:
        new_products.write.mode("append").parquet(paths.products)
        new_customers.write.mode("append").parquet(paths.customers)
        return n_new_prod + n_new_cust

    def write_sales() -> int:
        # kafka twin: events reference the FULL catalog incl. this cycle's
        # rows (the reference reads ids back from Postgres each loop)
        products = spark.read.parquet(paths.products)
        customers = spark.read.parquet(paths.customers)
        events = gen_sales_events(spark, magnitude, products, customers, seed=seed + cycle)
        records = to_kafka_records(events).withColumn("cycle", F.lit(cycle))
        records.write.mode("append").json(paths.sales_topic)
        return magnitude

    def write_inventory() -> int:
        products = spark.read.parquet(paths.products)
        # date pointer advances step_days per cycle (minio_loader.py:105-123)
        snap = gen_inventory_snapshots(
            spark,
            products,
            warehouses=warehouses,
            start=start_date,
            days=1,
            step_days=1,
            seed=seed + cycle,
        ).withColumn("date", F.date_add(F.col("date"), cycle * step_days))
        write_inventory_tree(snap, paths.inventory, mode="append")
        return snap.count()

    # catalog first (sales/inventory read it back), then the two fact
    # producers race — the concurrent half of the reference's process fleet.
    counts = {"catalog": write_catalog()}
    with ThreadPoolExecutor(max_workers=2) as pool:
        sales_f = pool.submit(write_sales)
        inv_f = pool.submit(write_inventory)
        counts["sales"] = sales_f.result()
        counts["inventory"] = inv_f.result()
    return counts


def run_chargers(
    spark: SparkSession,
    root: str,
    cycles: int = 0,
    config: EngineConfig | None = None,
    seed: int = 42,
    **cycle_kwargs,
) -> list[dict[str, int]]:
    """The fleet driver (load.py twin): run `cycles` cycles (0 = forever,
    like the reference's while True), sleeping ``interval_seconds``
    between cycles. Restartable: cycle numbering resumes from the sales
    topic's high-water cycle."""
    cfg = config or DEFAULT
    paths = ChargerPaths(root)
    start_cycle = _topic_max_cycle(spark, paths.sales_topic) + 1
    history: list[dict[str, int]] = []
    i = start_cycle
    while cycles == 0 or i < start_cycle + cycles:
        counts = run_cycle(
            spark, paths, cycle=i, magnitude=cfg.magnitude_order, seed=seed, **cycle_kwargs
        )
        history.append(counts)
        i += 1
        more = cycles == 0 or i < start_cycle + cycles
        if more and cfg.interval_seconds > 0:
            time.sleep(cfg.interval_seconds)
    return history


def _topic_max_cycle(spark: SparkSession, path: str) -> int:
    """Highest cycle number already written to the topic dir; -1 if none —
    the restart position (the reference producers recover theirs from
    Postgres sequence state / bucket listings)."""
    try:
        row = spark.read.json(path).agg(F.max("cycle")).first()
        return int(row[0]) if row and row[0] is not None else -1
    except AnalysisException:  # topic dir absent — fresh start
        return -1


def stream_chargers(
    spark: SparkSession,
    root: str,
    checkpoint: str,
    rows_per_batch: int = 100,
    max_rows: int = 0,
) -> "object":
    """G6 streaming twin: the sales producer as a Structured Streaming job.

    The batch fleet (run_chargers) mirrors the reference's sleep-loop
    processes; this is the engine-native upgrade — the synthetic_sales
    custom source (sources/pysource.py) emits rows_per_batch rows per
    microbatch with a CHECKPOINTED offset, and the kafka-wire-format
    records append to the topic directory exactly once across restarts
    (the recovery contract the reference producers lack: killing one
    mid-loop re-emits rows; killing this stream resumes from the offset).

    Returns the StreamingQuery; caller stops it (or caps with max_rows
    and processAllAvailable for bounded runs)."""
    from devcontainers_etl_node_spark.sources.pysource import SyntheticSalesDataSource

    spark.dataSource.register(SyntheticSalesDataSource)
    paths = ChargerPaths(root)
    stream = (
        spark.readStream.format("synthetic_sales")
        .option("rows_per_batch", rows_per_batch)
        .option("max_rows", max_rows)
        .load()
    )
    records = to_kafka_records(stream, key_col="event_id")
    return (
        records.writeStream.format("json")
        .option("path", paths.sales_topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
