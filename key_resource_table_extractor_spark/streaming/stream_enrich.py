"""Stream-static enrichment: a live event stream joined to a slowly-
changing dimension (user → segment) — the standard streaming-enrichment
topology (the streaming analog of the batch broadcast-dim joins, J8/S9).

The dimension side is STATIC per query run and broadcast, so the stream
never shuffles: enrichment is a stateless map-side hash lookup on every
micro-batch, exactly-once through the file-sink commit log. At 100 TB/day
the dimension refreshes by restarting the query on the same checkpoint
(file sources replay nothing; the new broadcast applies to new batches) —
no stream-stream state, no watermark needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .windowed_stats import run_events_stream


def enrich_events(src: DataFrame, dim: DataFrame) -> DataFrame:
    """Left-join the event stream to the broadcast dimension on user_id
    (left: events with an unknown user keep flowing, segment NULL — an
    inner join would silently drop them)."""
    return src.join(F.broadcast(dim), "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.col("segment"),
    )


def run_stream_enrich(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Start the enrichment stream; returns the StreamingQuery."""
    return run_events_stream(
        spark,
        lambda src: enrich_events(src, dim),
        input_dir,
        output_dir,
        checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
