from .stream import (
    DRAIN_PROGRESS,
    dedupe_within_watermark,
    drain_session,
    enriched_stream,
    events_stream,
    run_to_memory,
    run_upsert_sink,
    view_purchase_interval_join,
    session_rollup,
    sliding_value_stats,
    tumbling_value_rollup,
    vol_spike_alerts,
)

__all__ = [
    "DRAIN_PROGRESS",
    "dedupe_within_watermark",
    "drain_session",
    "enriched_stream",
    "events_stream",
    "run_to_memory",
    "run_upsert_sink",
    "view_purchase_interval_join",
    "session_rollup",
    "sliding_value_stats",
    "tumbling_value_rollup",
    "vol_spike_alerts",
]
