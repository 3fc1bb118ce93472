"""Event-time SESSION windows over a live event feed (gap-based, per user).

The batch engine covers sessionization as gaps-and-islands
(`event_sessions`, 30-minute gap rule); this is the Structured Streaming
counterpart using the built-in ``session_window`` — dynamic windows that
extend while events keep arriving within ``gap`` of the session's end and
close once the watermark passes end+gap. Unlike the tumbling
`windowed_stats`, session state is keyed (user_id, open session) and the
window boundaries are data-driven; Spark merges sessions across
micro-batches internally (two events 5 minutes apart in different triggers
still land in ONE session row).

100 TB/day contract: state is O(open sessions), bounded by the watermark
horizon; append mode emits each closed session exactly once; rows later
than the watermark are dropped, never reopening a finalized session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .windowed_stats import run_events_stream


def session_window_stats(src, gap: str = "30 minutes",
                         watermark: str = "30 minutes"):
    """Per-user gap-based sessions: span, event count, value sum."""
    return (
        src.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_session_window_stats(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Start the session-window stream; returns the StreamingQuery."""
    return run_events_stream(
        spark,
        lambda src: session_window_stats(src, gap=gap, watermark=watermark),
        input_dir,
        output_dir,
        checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
