"""Kafka producer sink (K5), Spark-first.

Reference (``kafka_loader.py:18-24, 85-115``): JSON-serialize each event
dict, key by event_id, ``acks=all``. Spark mapping: one ``to_json(struct)``
projection + the Kafka batch sink — serialization is vectorized, the
producer batching (linger) is connector-level config.

``to_kafka_records`` (the serialization half) is pure DataFrame code and
unit-tested; the actual send needs the connector jar + broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from devcontainers_etl_node_spark.config import DEFAULT, EngineConfig


def to_kafka_records(df: DataFrame, key_col: str = "event_id") -> DataFrame:
    """(key, value) pairs: key = event id, value = compact JSON of the row
    (F11). Column order inside the struct is the DataFrame column order,
    matching the reference's dict field order."""
    payload_cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def write_events(df: DataFrame, config: EngineConfig | None = None) -> None:  # pragma: no cover
    """Send rows to the sales topic with acks=all (K5)."""
    cfg = config or DEFAULT
    (
        to_kafka_records(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
        .option("topic", cfg.kafka_topic)
        .option("kafka.acks", "all")
        .option("kafka.linger.ms", "50")
        .save()
    )
