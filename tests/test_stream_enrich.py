"""Stream-static enrichment semantics: every micro-batch is enriched by
the broadcast dimension, unknown users keep flowing with NULL segment,
and restarts on the same checkpoint are exactly-once (no duplicates)."""

from __future__ import annotations

from key_resource_table_extractor_spark.streaming import run_stream_enrich
from tests.test_windowed_stream import _write_batch


def _dim(spark):
    return spark.createDataFrame(
        [(1, "gold"), (3, "silver")], "user_id bigint, segment string"
    )


def test_enrichment_joins_and_keeps_unknown_users(spark, tmp_path):
    inp, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    _write_batch(spark, [
        (1, 1, "click", "2026-01-01 10:00:00", 1.0),
        (2, 2, "view", "2026-01-01 10:01:00", 2.0),   # unknown user
    ], inp)
    _write_batch(spark, [
        (3, 3, "click", "2026-01-01 10:02:00", 3.0),
    ], inp)
    q = run_stream_enrich(spark, inp, out, cp, _dim(spark))
    q.awaitTermination(120)

    got = {
        r["event_id"]: r["segment"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: "gold", 2: None, 3: "silver"}


def test_restart_is_exactly_once(spark, tmp_path):
    inp, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    _write_batch(spark, [
        (1, 1, "click", "2026-01-01 10:00:00", 1.0),
    ], inp)
    q = run_stream_enrich(spark, inp, out, cp, _dim(spark))
    q.awaitTermination(120)
    # restart on the same checkpoint with one NEW file
    _write_batch(spark, [
        (2, 3, "view", "2026-01-01 10:05:00", 2.0),
    ], inp)
    q = run_stream_enrich(spark, inp, out, cp, _dim(spark))
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]  # no replays
