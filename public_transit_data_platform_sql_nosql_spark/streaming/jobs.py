"""Structured Streaming forms of the event analytics.

``stream_windowed_counts`` is the streaming twin of
queries/events.windowed_counts: file-source ``readStream`` over the events
parquet, event-time tumbling window + watermark for late data, and an
``availableNow`` trigger so tests drain the source deterministically.

``incremental_refresh`` is the SURVEY.md §2.9 extension: the reference's
20-minute chunked MySQL→Mongo ETL re-expressed as a ``foreachBatch``
incremental refresh — each micro-batch of new stop_times is denormalized
and appended, replacing offset-pagination with Spark's own source tracking
(checkpointed offsets, exactly-once per batch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NS = 1_000_000_000

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (legacy nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's events parquet (one file per
    batch caps micro-batch size, like maxFilesPerTrigger on a real feed)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )


def stream_windowed_counts(
    events: DataFrame,
    window_secs: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window with watermark; same measures as the
    batch operator (integer cents keep sums engine-deterministic)."""
    with_time = events.withColumn(
        "event_time", F.timestamp_seconds(F.expr(f"ts div {NS}"))
    ).withWatermark("event_time", watermark)
    return (
        with_time.groupBy(
            F.window("event_time", f"{window_secs} seconds").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) AS bigint)"))
            .alias("sum_cents"),
        )
        .select(
            F.unix_timestamp("win.start").alias("window_start_sec"),
            "event_type", "n_events", "sum_cents",
        )
    )


def run_to_memory(result: DataFrame, table_name: str,
                  mode: str = "complete") -> None:
    """Drain the stream into an in-memory sink (tests/demos): processes
    everything available now, then stops."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_refresh(
    stop_times_stream: DataFrame,
    denormalize_batch: Callable[[DataFrame], DataFrame],
    sink_path: str,
    checkpoint_path: str,
):
    """foreachBatch incremental denormalization (reference parity note:
    replaces /root/reference/Mongo/denormalization.py:51-77's LIMIT/OFFSET
    chunk loop; the source's checkpoint replaces the manual offset)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = denormalize_batch(batch_df)
        out.write.mode("append").parquet(sink_path)

    return (
        stop_times_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
