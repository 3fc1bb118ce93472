"""Session-window streaming semantics: events within the gap merge into one
session (even across micro-batches), a quiet period longer than the gap
starts a new session, and sessions finalize exactly once via the
watermark."""

from __future__ import annotations

from key_resource_table_extractor_spark.streaming import (
    run_session_window_stats,
)
from tests.test_windowed_stream import _write_batch


def test_sessions_merge_within_gap_and_split_across_it(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    # user 1: events at 10:00 and 10:10 (same session, gap 30m), then
    # 11:30 (new session: 80m quiet > gap). The two batches arrive in
    # SEPARATE micro-batches (maxFilesPerTrigger=1) — Spark must merge
    # the 10:10 event into the open 10:00 session.
    _write_batch(spark, [
        (1, 1, "click", "2026-01-01 10:00:00", 1.0),
    ], inp)
    _write_batch(spark, [
        (2, 1, "click", "2026-01-01 10:10:00", 2.0),
        (3, 1, "click", "2026-01-01 11:30:00", 4.0),
    ], inp)
    # watermark pusher closes everything: 14:00 → watermark 13:30
    _write_batch(spark, [
        (4, 9, "view", "2026-01-01 14:00:00", 0.0),
    ], inp)
    q = run_session_window_stats(spark, inp, out, cp)
    q.awaitTermination(120)

    rows = [
        r for r in spark.read.parquet(out).collect() if r["user_id"] == 1
    ]
    got = {
        str(r["s_start"]): (r["n_events"], r["sum_value"]) for r in rows
    }
    assert got == {
        "2026-01-01 10:00:00": (2, 3.0),  # merged across micro-batches
        "2026-01-01 11:30:00": (1, 4.0),  # split by the >gap quiet period
    }
    # session end = last event + gap
    ends = {str(r["s_start"]): str(r["s_end"]) for r in rows}
    assert ends["2026-01-01 10:00:00"] == "2026-01-01 10:40:00"


def test_late_row_does_not_reopen_finalized_session(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    _write_batch(spark, [
        (1, 1, "click", "2026-01-01 10:00:00", 1.0),
    ], inp)
    _write_batch(spark, [
        (2, 9, "view", "2026-01-01 14:00:00", 0.0),  # watermark → 13:30
    ], inp)
    q = run_session_window_stats(spark, inp, out, cp)
    q.awaitTermination(120)

    # restart on the same checkpoint with a row far behind the watermark
    _write_batch(spark, [
        (3, 1, "click", "2026-01-01 10:05:00", 100.0),  # late — dropped
        (4, 9, "view", "2026-01-01 15:00:00", 0.0),
    ], inp)
    q = run_session_window_stats(spark, inp, out, cp)
    q.awaitTermination(120)

    rows = [
        r for r in spark.read.parquet(out).collect() if r["user_id"] == 1
    ]
    assert len(rows) == 1
    assert rows[0]["n_events"] == 1 and rows[0]["sum_value"] == 1.0
