"""applyInPandasWithState sessionizer vs the batch sessionizer."""

from __future__ import annotations

from pasgal_spark.functions.events import sessionize
from pasgal_spark.streaming.events import read_event_stream
from pasgal_spark.streaming.sessions import stateful_sessionize


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    # several time-ordered files so state crosses micro-batches in event-time
    # order (the streaming in-order delivery assumption; file source lists
    # part files in name order = range-partition order)
    spark.read.parquet(f"{sf_dir}/events.parquet").repartitionByRange(
        8, "ts"
    ).sortWithinPartitions("ts", "event_id").write.parquet(src)

    stream = read_event_stream(spark, src)
    q = (
        stateful_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: keep the final row per user (max sessions)
    got_df = spark.table("sessions_test").groupBy("user_id").max("sessions")
    got = {r[0]: r[1] for r in got_df.collect()}

    batch = dict(sessionize(spark.read.parquet(src)).collect())
    assert got == batch
