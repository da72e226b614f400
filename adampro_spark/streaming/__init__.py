from adampro_spark.streaming.ingest import (  # noqa: F401
    assign_sessions,
    session_funnel,
    sessionize_events,
    stream_asof,
    stream_events,
    stream_insert_entity,
    windowed_event_stats,
)
