from insect_observation_data_pipeline_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
    run_batch_backfill,
)

__all__ = ["read_events_stream", "windowed_event_counts", "run_batch_backfill"]
