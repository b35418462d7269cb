"""Kafka WIRE roundtrip through the in-process loopback segment log.

No broker or connector jar exists in this sandbox, so the real network
half cannot run — this is the closest executable equivalent (the Kafka
analogue of the embedded-Derby JDBC roundtrip): the producer-side
serialization (``sinks/kafka.py:to_kafka_records`` — key string + compact
JSON value, reference ``src/data_chargers/kafka_loader.py:18-24``) is
written as length-prefixed BINARY frames to disk, read back by the
``kafka_loopback`` DataSource with the real Kafka source's column
contract, and decoded by the consumer half
(``sources/kafka.py:parse_event_stream``, reference
``src/etl/extractors.py:46``). Every byte a broker would carry is
produced and re-parsed.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.sinks.kafka import to_kafka_records
from devcontainers_etl_node_spark.sources.kafka import parse_event_stream
from devcontainers_etl_node_spark.sources.kafka_loopback import (
    KafkaLoopbackDataSource,
    produce,
)


@pytest.fixture()
def loopback(spark):
    spark.dataSource.register(KafkaLoopbackDataSource)
    return spark


EVENTS = [
    ("e-1", "2024-03-01T10:00:00Z", 11, 101, 2, 19.99),
    ("e-2", "2024-03-01T10:00:05Z", 12, 102, 1, 5.50),
    ("e-3", "2024-03-01T10:01:00Z", 11, 103, 4, 0.99),
]
COLS = ["event_id", "ts", "customer_id", "product_id", "qty", "unit_price"]


def test_kafka_wire_roundtrip(loopback, tmp_path):
    spark = loopback
    topic = str(tmp_path / "sales_topic")
    events = spark.createDataFrame(
        EVENTS, "event_id string, ts string, customer_id long, product_id long, qty int, unit_price double"
    )

    produce(to_kafka_records(events), topic)

    raw = spark.read.format("kafka_loopback").option("path", topic).load()
    # the source exposes the REAL kafka column contract
    assert dict(raw.dtypes) == {
        "key": "binary", "value": "binary", "topic": "string",
        "partition": "int", "offset": "bigint",
        "timestamp": "timestamp", "timestampType": "int",
    }
    # key bytes are the utf-8 event id (kafka_loader keys by event_id)
    keys = sorted(bytes(r.key).decode() for r in raw.collect())
    assert keys == ["e-1", "e-2", "e-3"]

    back = parse_event_stream(raw)
    got = sorted(
        (r.event_id, r.customer_id, r.product_id, r.qty, r.unit_price)
        for r in back.collect()
    )
    assert got == sorted((e[0], e[2], e[3], e[4], e[5]) for e in EVENTS)
    # ts survived as a real timestamp (ISO string on the wire, F1 cast)
    assert dict(back.dtypes)["ts"] == "timestamp"
    assert back.filter(F.col("ts").isNull()).count() == 0


def test_loopback_null_key_and_malformed_value(loopback, tmp_path):
    """Wire-level edge cases: a null key frames as the 0xFFFFFFFF length
    (Kafka's null encoding) and survives the roundtrip; a malformed JSON
    value decodes to null columns (the reference's skip-on-decode-error)."""
    spark = loopback
    topic = str(tmp_path / "edge_topic")
    rows = [
        (None, '{"event_id":"ok-1","ts":"2024-03-01T10:00:00Z","customer_id":1,'
               '"product_id":2,"qty":3,"unit_price":4.5}'),
        ("k2", "this is not json"),
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    produce(df, topic)

    raw = spark.read.format("kafka_loopback").option("path", topic).load()
    assert raw.count() == 2
    assert raw.filter(F.col("key").isNull()).count() == 1

    back = parse_event_stream(raw)
    ok = back.filter(F.col("event_id").isNotNull()).collect()
    assert len(ok) == 1 and ok[0].event_id == "ok-1"
    assert back.filter(F.col("event_id").isNull()).count() == 1  # malformed → nulls


def test_loopback_multi_batch_append_and_offsets(loopback, tmp_path):
    """Two produce() calls append (second batch's records are new
    segments, nothing overwritten) and per-segment offsets are dense from
    0 — the consumption contract downstream replay logic relies on."""
    spark = loopback
    topic = str(tmp_path / "t2")
    b1 = spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string")
    b2 = spark.createDataFrame([("c", "3")], "key string, value string")
    produce(b1.coalesce(1), topic)
    produce(b2.coalesce(1), topic)

    raw = spark.read.format("kafka_loopback").option("path", topic).load()
    assert raw.count() == 3
    per_part = {
        (r.partition, r.offset) for r in raw.select("partition", "offset").collect()
    }
    for pid in {p for p, _ in per_part}:
        offs = sorted(o for p, o in per_part if p == pid)
        assert offs == list(range(len(offs)))
