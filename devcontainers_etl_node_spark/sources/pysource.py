"""Custom Python DataSource (Spark 4 API): the synthetic sales generator
as a REAL pluggable source — batch and streaming — instead of a
driver-side DataFrame builder.

Why this matters for the reference surface: the reference's producers
(``src/data_chargers/kafka_loader.py:96-118``) are external processes
feeding a broker; Spark-native, the same feed is a *source* the engine
reads like any other:

    spark.dataSource.register(SyntheticSalesDataSource)
    spark.read.format("synthetic_sales").option("rows", 1000).load()
    spark.readStream.format("synthetic_sales").option("rows_per_batch", 50).load()

Scale design: batch reads split into ``partitions`` independent input
partitions — each executor generates its slice from (seed, partition id)
with no driver participation and no shuffle; the streaming reader tracks
a monotonically increasing row offset (restart-safe: the offset dict is
checkpointed by the engine), emitting ``rows_per_batch`` rows per
microbatch up to an optional ``max_rows`` cap.

Rows are deterministic functions of the global row index — the same
xxhash-free integer mixing the SQL-side generators use, so tests can pin
exact values.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "event_id bigint, customer_id bigint, product_id bigint, qty int, unit_price double"
)


def _row(i: int, seed: int) -> tuple:
    # splitmix64-style integer mixing — deterministic, uniform, pure python
    z = (i + seed) * 0x9E3779B97F4A7C15 % (1 << 64)
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
    z ^= z >> 31
    return (
        i,
        z % 1000 + 1,
        (z >> 10) % 200 + 1,
        int((z >> 20) % 4 + 1),
        round(9.99 + (z >> 22) % 29000 / 100.0, 2),
    )


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticSalesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        per = -(-self.n // self.num_partitions)  # ceil
        return [
            _Partition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Partition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed)


class SyntheticSalesStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"index": next_row_to_emit}. Each microbatch emits up to
    rows_per_batch rows; max_rows caps the stream so tests (and bounded
    backfills) terminate. Restart resumes from the checkpointed offset —
    the exact recovery contract the reference producers lack."""

    def __init__(self, options):
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        return iter([_row(i, self.seed) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i, self.seed) for i in range(start["index"], end["index"])])


class SyntheticSalesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_sales"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticSalesReader:
        return SyntheticSalesReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticSalesStreamReader:
        return SyntheticSalesStreamReader(self.options)
