"""In-process Kafka loopback: a segment-log topic on disk with Kafka-style
record framing, so the producer and consumer halves of the Kafka path can
be executed through REAL bytes without a broker.

No broker or connector jar exists in this container (verified each round),
so the reference's Kafka wire path (``src/data_chargers/kafka_loader.py:
18-24`` producing key + JSON value ↔ ``src/etl/extractors.py:46``
consuming and JSON-decoding) could previously only be tested as its two
pure-DataFrame halves. This module closes the loop the way the embedded
Derby database closed the JDBC wire gap: a *topic* is a directory of
append-only segment files, one per producing task, holding length-prefixed
binary records —

    [8B timestamp_ms][4B key_len][key bytes][4B value_len][value bytes]

(big-endian; key_len == 0xFFFFFFFF encodes a null key, as in Kafka's wire
protocol). ``produce`` writes them executor-side via ``foreachPartition``
(no driver collect); the ``kafka_loopback`` Python DataSource reads them
back with the SAME column contract Spark's real Kafka source exposes
(key/value binary, topic, partition, offset, timestamp, timestampType),
so ``parse_event_stream`` and every downstream transform run unchanged
against either source.

Scale notes: one segment per producing task is exactly Kafka's
partition-parallel layout; the reader maps one InputPartition per segment
so consumption parallelism follows production parallelism. This loopback
targets a local/shared filesystem — it is a test double for wire-format
parity, not a queue (no replication, no consumer groups); production use
is the real connector with the identical DataFrame contract.
"""

from __future__ import annotations

import os
import struct
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_NULL_LEN = 0xFFFFFFFF

KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def _frame(ts_ms: int, key: bytes | None, value: bytes | None) -> bytes:
    kb = b"" if key is None else key
    vb = b"" if value is None else value
    return (
        struct.pack(">q", ts_ms)
        + struct.pack(">I", _NULL_LEN if key is None else len(kb))
        + kb
        + struct.pack(">I", _NULL_LEN if value is None else len(vb))
        + vb
    )


def _read_frames(path: str) -> Iterator[tuple[int, bytes | None, bytes | None]]:
    with open(path, "rb") as f:
        data = f.read()
    pos, n = 0, len(data)
    while pos < n:
        (ts_ms,) = struct.unpack_from(">q", data, pos)
        pos += 8
        (klen,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if klen == _NULL_LEN:
            key = None
        else:
            key = data[pos : pos + klen]
            pos += klen
        (vlen,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if vlen == _NULL_LEN:
            value = None
        else:
            value = data[pos : pos + vlen]
            pos += vlen
        yield ts_ms, key, value


def produce(records: DataFrame, topic_dir: str, key_col: str = "key",
            value_col: str = "value") -> None:
    """Append a (key, value) DataFrame to the topic as framed binary
    segments — the producer half of the wire. Runs executor-side: each
    task writes its own segment file (Kafka's per-partition append), the
    driver never sees a record. String columns are UTF-8 encoded, binary
    passes through — matching the real connector's input contract.
    """
    import uuid

    os.makedirs(topic_dir, exist_ok=True)
    kv = records.select(
        F.col(key_col).cast("binary").alias("k"), F.col(value_col).cast("binary").alias("v")
    )
    # one batch token per produce() call, fixed on the driver: a RETRIED
    # task attempt rewrites the same (batch, partition) segment name
    # atomically instead of duplicating records — per-task exactly-once,
    # the file-sink equivalent of the idempotent producer
    batch = uuid.uuid4().hex[:12]

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = 0 if ctx is None else ctx.partitionId()
        buf = bytearray()
        now_ms = int(time.time() * 1000)
        count = 0
        for r in rows:
            buf += _frame(now_ms, r.k, r.v)
            count += 1
        if count == 0:
            return
        tmp = os.path.join(topic_dir, f".segment-{batch}-{pid:05d}.tmp")
        final = os.path.join(topic_dir, f"segment-{batch}-{pid:05d}.log")
        with open(tmp, "wb") as f:
            f.write(bytes(buf))
        os.replace(tmp, final)  # atomic publish, half-written segments invisible

    kv.foreachPartition(write_partition)


class _Segment(InputPartition):
    def __init__(self, path: str, partition_id: int):
        self.path, self.partition_id = path, partition_id


class LoopbackReader(DataSourceReader):
    def __init__(self, options):
        self.topic_dir = options["path"]
        self.topic = options.get("topic", os.path.basename(options["path"].rstrip("/")))

    def partitions(self):
        segs = sorted(
            f for f in os.listdir(self.topic_dir)
            if f.startswith("segment-") and f.endswith(".log")
        )
        return [_Segment(os.path.join(self.topic_dir, s), i) for i, s in enumerate(segs)]

    def read(self, partition: _Segment) -> Iterator[tuple]:
        import datetime

        for offset, (ts_ms, key, value) in enumerate(_read_frames(partition.path)):
            yield (
                key,
                value,
                self.topic,
                partition.partition_id,
                offset,
                datetime.datetime.fromtimestamp(ts_ms / 1000.0, datetime.timezone.utc),
                0,  # CreateTime, as the real source reports
            )


class KafkaLoopbackDataSource(DataSource):
    """``spark.read.format("kafka_loopback").option("path", dir).load()`` —
    same column contract as ``spark.read.format("kafka")``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_loopback"

    def schema(self) -> str:
        return KAFKA_RECORD_SCHEMA

    def reader(self, schema) -> LoopbackReader:
        return LoopbackReader(self.options)
