"""Custom Python DataSource (Spark 4 API): batch partition fan-out,
deterministic rows, and streaming offset tracking with bounded replay."""

import pytest

from devcontainers_etl_node_spark.sources.pysource import SyntheticSalesDataSource, _row


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticSalesDataSource)


def test_batch_read_deterministic_and_partitioned(spark):
    df = (
        spark.read.format("synthetic_sales")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = sorted(df.collect())
    assert len(rows) == 100
    assert [tuple(r) for r in rows[:2]] == [_row(0, 42), _row(1, 42)]
    # re-read is identical (seeded)
    again = sorted(
        spark.read.format("synthetic_sales").option("rows", 100).option("partitions", 4).load().collect()
    )
    assert rows == again


def test_batch_rows_cap_not_divisible(spark):
    df = spark.read.format("synthetic_sales").option("rows", 10).option("partitions", 3).load()
    assert df.count() == 10


def test_stream_reads_in_batches_to_cap(spark, tmp_path):
    q = (
        spark.readStream.format("synthetic_sales")
        .option("rows_per_batch", 30)
        .option("max_rows", 75)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n FROM synth_stream").first().n
        assert got == 75  # 30 + 30 + 15, capped
        ids = [r.event_id for r in spark.sql("SELECT event_id FROM synth_stream").collect()]
        assert sorted(ids) == list(range(75))  # no gaps, no dupes across batches
    finally:
        q.stop()
