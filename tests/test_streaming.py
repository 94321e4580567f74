from __future__ import annotations

from insect_observation_data_pipeline_spark.streaming import (
    read_events_stream,
    run_batch_backfill,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_matches_batch_backfill(spark, tmp_path):
    """availableNow stream over the events parquet == batch backfill —
    the one-code-path property the window() formulation buys."""
    # the testdata events file has nanos timestamps Spark can't stream;
    # re-write a microsecond copy first (prod sources are us-precision).
    from insect_observation_data_pipeline_spark.sources.parquet import read_table

    src = str(tmp_path / "events_us.parquet")
    read_table(spark, "/root/testdata/sf0.001", "events").write.parquet(src)

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM ev_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_batch_backfill(spark, src).collect()
    }
    assert len(got) > 0
    assert got == expected
