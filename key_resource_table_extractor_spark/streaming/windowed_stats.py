"""Event-time windowed aggregation with watermark-gated late-data handling.

The batch operators cover gaps-and-islands sessionization (`event_sessions`)
over static data; this is the Structured Streaming counterpart for a live
event feed: tumbling event-time windows per event_type, finalized (append
mode) only once the watermark passes the window end, with rows later than
the watermark dropped — the standard late-data contract for a 100 TB/day
event pipeline where state must stay bounded.

State size is O(open windows × event_types), independent of throughput;
the watermark bounds how long a window stays open.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

# watermarks require TIMESTAMP (with timezone); NTZ is rejected by
# EventTimeWatermark
EVENTS_DDL = (
    "event_id bigint, user_id bigint, event_type string, "
    "ts timestamp, value double"
)


def windowed_event_stats(src, window: str = "10 minutes",
                         watermark: str = "30 minutes"):
    """Tumbling-window counts/sums per event_type over an event stream."""
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_event_stats(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Start the windowed-stats stream; returns the StreamingQuery.

    Append mode: a window row is written exactly once, when the watermark
    passes its end; later-than-watermark input rows are dropped.
    """
    return run_events_stream(
        spark,
        lambda src: windowed_event_stats(
            src, window=window, watermark=watermark
        ),
        input_dir,
        output_dir,
        checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )


def run_events_stream(
    spark: SparkSession,
    agg_fn,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Shared runner scaffold for the event-stream aggregations (tumbling
    windows, session windows): parquet file source with the events DDL,
    append-mode parquet sink, availableNow trigger. One place to fix
    trigger/checkpoint/option handling for every runner."""
    reader = spark.readStream.schema(EVENTS_DDL).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = agg_fn(reader.load(input_dir))
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
