from pasgal_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    windowed_event_counts,
    run_to_memory_sink,
)
