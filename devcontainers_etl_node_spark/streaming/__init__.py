from devcontainers_etl_node_spark.streaming.pipeline import (
    click_purchase_join,
    deduped_events,
    streaming_content_dedup,
    enriched_stream,
    fingerprint_sink,
    read_fingerprint_state,
    hourly_event_counts,
    session_windows,
    upsert_sink,
    upsert_sink_partitioned,
    user_running_totals,
)

__all__ = [
    "click_purchase_join",
    "enriched_stream",
    "fingerprint_sink",
    "read_fingerprint_state",
    "hourly_event_counts",
    "deduped_events",
    "streaming_content_dedup",
    "session_windows",
    "upsert_sink",
    "upsert_sink_partitioned",
    "user_running_totals",
]
