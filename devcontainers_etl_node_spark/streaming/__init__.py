from devcontainers_etl_node_spark.streaming.pipeline import (
    deduped_events,
    hourly_event_counts,
    session_windows,
    user_running_totals,
)

__all__ = [
    "hourly_event_counts",
    "deduped_events",
    "session_windows",
    "user_running_totals",
]
