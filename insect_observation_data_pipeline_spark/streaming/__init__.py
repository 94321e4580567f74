from insect_observation_data_pipeline_spark.streaming.events import (
    read_events_stream,
    sessionized_event_counts,
    windowed_event_counts,
    run_batch_backfill,
)
from insect_observation_data_pipeline_spark.streaming.joins import attribute_purchases
from insect_observation_data_pipeline_spark.streaming.stateful import (
    advance_funnel_state,
    advance_session_state,
    dedup_stream,
    funnel_stateful,
    sessionize_stateful,
)
from insect_observation_data_pipeline_spark.streaming.sink import (
    dedup_ingest_sink,
    keyed_state_sink,
    merge_latest,
    segment_scrub_sink,
    span_scrub_sink,
)

__all__ = [
    "read_events_stream",
    "sessionized_event_counts",
    "windowed_event_counts",
    "run_batch_backfill",
    "attribute_purchases",
    "advance_funnel_state",
    "advance_session_state",
    "dedup_stream",
    "funnel_stateful",
    "sessionize_stateful",
    "dedup_ingest_sink",
    "keyed_state_sink",
    "merge_latest",
    "segment_scrub_sink",
    "span_scrub_sink",
]
