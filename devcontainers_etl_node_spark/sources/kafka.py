"""Kafka sources: the reference's bounded topic replay (S2), Spark-first.

Reference behavior (``extractors.py:41-73``): assign all partitions, seek
to beginning, poll until empty or ``KAFKA_MAX_RECORDS``, JSON-decode each
value in Python. Spark mapping: one batch read with
``startingOffsets=earliest`` / ``endingOffsets=latest`` and a vectorized
``from_json`` — the per-message Python loop disappears.

The record cap maps to ``limit(n)``; like the reference's own cap it is a
cap, not an exact count, and which records are kept is not deterministic
across partitions (SURVEY §7 risk list) — both engines share that
semantics.

No broker exists in this container (and the Kafka connector jar is not on
the classpath), so ``read_topic`` raises a clear error when unavailable;
``parse_event_stream`` — the transformation half — is pure DataFrame code
and is unit-tested against literal JSON rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from devcontainers_etl_node_spark.config import DEFAULT, EngineConfig
from devcontainers_etl_node_spark.schemas import SALES_EVENT


def parse_event_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka value bytes/strings → typed sales-event rows (F10).

    Applies the declared SALES_EVENT schema via from_json (no inference),
    then casts the ISO-8601 ``ts`` string to a UTC timestamp (F1).
    Malformed JSON → null struct → null columns, mirroring the reference's
    skip-on-decode-error behavior.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), SALES_EVENT).alias("e")
    ).select("e.*")
    return parsed.withColumn("ts", F.to_timestamp("ts"))


def read_topic(
    spark: SparkSession,
    config: EngineConfig | None = None,
    max_records: int | None = None,
) -> DataFrame:
    """Bounded earliest→latest batch read of the sales topic (S2/O4)."""
    cfg = config or DEFAULT
    try:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
            .option("subscribe", cfg.kafka_topic)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load()
        )
    except Exception as e:  # pragma: no cover - no broker/jar in this env
        raise RuntimeError(
            "Kafka source unavailable (needs the spark-sql-kafka connector "
            "jar and a reachable broker); use parse_event_stream on rows "
            "from any source for the transformation half"
        ) from e
    events = parse_event_stream(raw)
    cap = max_records if max_records is not None else cfg.kafka_max_records
    return events.limit(cap)
