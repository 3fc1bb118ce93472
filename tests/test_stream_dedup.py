"""Streaming dedup semantics: re-delivered doc_ids (and exact-content
duplicates under the fingerprint key) are dropped across micro-batches and
across checkpointed restarts, with state bounded by the watermark."""

from __future__ import annotations

import pandas as pd

from key_resource_table_extractor_spark.streaming.stream_dedup import (
    run_stream_dedup,
)


def _write_batch(spark, rows, path):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf).selectExpr(
        "doc_id", "text", "CAST(ts AS timestamp) ts"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_doc_id_dedup_across_batches_and_restart(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    _write_batch(spark, [
        ("d1", "alpha", "2026-01-01 10:00:00"),
        ("d2", "beta", "2026-01-01 10:01:00"),
    ], inp)
    _write_batch(spark, [
        ("d1", "alpha", "2026-01-01 10:05:00"),  # re-delivery → dropped
        ("d3", "gamma", "2026-01-01 10:06:00"),
    ], inp)
    run_stream_dedup(spark, inp, out, cp).awaitTermination(120)
    # restart with a later re-delivery still inside the watermark horizon
    _write_batch(spark, [
        ("d2", "beta", "2026-01-01 10:20:00"),   # dropped (state survives)
        ("d4", "delta", "2026-01-01 10:21:00"),
    ], inp)
    run_stream_dedup(spark, inp, out, cp).awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == ["d1", "d2", "d3", "d4"], got


def test_fingerprint_dedup_catches_renamed_duplicates(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    _write_batch(spark, [
        ("a1", "same  text here", "2026-01-01 10:00:00"),
        ("a2", "same text  here", "2026-01-01 10:01:00"),  # ws-normalized dup
        ("a3", "different text", "2026-01-01 10:02:00"),
    ], inp)
    run_stream_dedup(spark, inp, out, cp, key="fingerprint").awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert len(got) == 2 and "a3" in got, got
