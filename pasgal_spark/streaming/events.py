"""Structured Streaming adapters for the events table.

The reference is a batch system (SURVEY.md §2F: no streaming anywhere in
PASGAL), so streaming here is *additive* capability: the incremental twin of
``pasgal_spark.functions.events.hourly_rollup`` — a file-source stream with
event-time tumbling windows and a watermark for late data. On a cluster the
source would be a Kafka/Iceberg CDC feed; the file source exercises the
same incremental execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_event_counts(
    stream: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with a late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_to_memory_sink(
    agg: DataFrame, query_name: str = "event_rollup"
) -> DataFrame:
    """Drain all available input (availableNow) into an in-memory table and
    return it as a DataFrame — the test/benchmark harness path."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(query_name)
