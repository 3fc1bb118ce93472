"""Streaming deduplication: drop repeated documents across micro-batches.

A crawler re-emits documents (retries, re-crawls); the training pipeline
must ingest each exactly once without holding unbounded state. Two built-in
strategies:

- ``key="doc_id"``: drop re-deliveries of the same document id;
- ``key="fingerprint"``: drop exact-content duplicates under different ids
  (md5 of normalized text — the streaming twin of the batch
  ``dedupe_prefix_fingerprint`` / ``curated_corpus`` keeper).

State is bounded by ``dropDuplicatesWithinWatermark``: a key is remembered
only while it can still legally reappear (the watermark window), the
standard exactly-once-within-horizon contract at web scale — unbounded
``dropDuplicates`` state on a 10^12-doc stream would OOM the state store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

DOCS_STREAM_DDL = "doc_id string, text string, ts timestamp"


def dedup_stream(src, key: str = "doc_id", watermark: str = "1 hour"):
    src = src.withWatermark("ts", watermark)
    if key == "fingerprint":
        src = src.withColumn(
            "fp", F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
        )
        return src.dropDuplicatesWithinWatermark(["fp"]).drop("fp")
    return src.dropDuplicatesWithinWatermark(["doc_id"])


def run_stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Start the dedup stream; returns the StreamingQuery."""
    reader = spark.readStream.schema(DOCS_STREAM_DDL).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(input_dir)
    out = dedup_stream(src, key=key, watermark=watermark)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
