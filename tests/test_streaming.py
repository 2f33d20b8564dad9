"""Streaming replay-equality tests (SURVEY.md §2.8 contract): each
streaming op drained with availableNow must equal its batch twin."""

import tempfile

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.streaming.stream import (
    events_stream,
    run_available_now,
    streaming_dedup,
    tumbling_counts,
)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_replay_equals_batch(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = tumbling_counts(events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        replay = run_available_now(stream, "t_tumbling", ckpt)
        cols = ["window_start", "event_type", "n_events", "total_value"]
        assert _sorted_rows(replay, cols) == _sorted_rows(batch, cols)


def test_streaming_dedup_replay(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch_n = streaming_dedup(ev).count()
    with tempfile.TemporaryDirectory() as ckpt:
        stream = streaming_dedup(events_stream(spark, sf_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("t_dedup").count() == batch_n
