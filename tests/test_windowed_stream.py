"""Watermark semantics of the streaming windowed aggregation: windows
finalize (append) once the watermark passes their end, and rows arriving
later than the watermark are dropped instead of reopening state."""

from __future__ import annotations

import pandas as pd

from key_resource_table_extractor_spark.streaming import (
    run_windowed_event_stats,
)


def _write_batch(spark, rows, path):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf).selectExpr(
        "CAST(event_id AS bigint) event_id",
        "CAST(user_id AS bigint) user_id",
        "event_type",
        "CAST(ts AS timestamp) ts",
        "CAST(value AS double) value",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_finalizes_windows_and_drops_late_rows(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    # window A = [10:00, 10:10): four on-time rows
    _write_batch(spark, [
        (1, 1, "click", "2026-01-01 10:01:00", 1.0),
        (2, 1, "click", "2026-01-01 10:03:00", 1.0),
        (3, 2, "click", "2026-01-01 10:04:00", 1.0),
        (4, 2, "click", "2026-01-01 10:08:00", 1.0),
    ], inp)
    # watermark pusher: 12:00 → watermark 11:30 > A.end after this trigger
    _write_batch(spark, [
        (5, 3, "view", "2026-01-01 12:00:00", 2.0),
    ], inp)
    q = run_windowed_event_stats(spark, inp, out, cp)
    q.awaitTermination(120)

    # second run on the same checkpoint: one LATE row for window A (behind
    # the 11:30 watermark → must be dropped) plus a fresh row
    _write_batch(spark, [
        (6, 9, "click", "2026-01-01 10:02:00", 100.0),  # late — dropped
        (7, 3, "view", "2026-01-01 12:30:00", 2.0),
    ], inp)
    q = run_windowed_event_stats(spark, inp, out, cp)
    q.awaitTermination(120)

    got = {
        (str(r["w_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    key = ("2026-01-01 10:00:00", "click")
    assert key in got, got
    # four on-time rows only — the late row (value=100) must not count
    assert got[key] == (4, 4.0), got
