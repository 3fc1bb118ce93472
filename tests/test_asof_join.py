"""Semantic oracle for the generic as-of join operator: nearest preceding
right row per key, inclusive at equal timestamps, deterministic tie-break,
nulls when nothing precedes. The DuckDB gate cross-checks the full query
(asof_view_attribution) against DuckDB's native ASOF JOIN; these unit tests
pin the operator's contract on crafted frames."""

from __future__ import annotations

import datetime as dt

from key_resource_table_extractor_spark.operators.relational import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_basic_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "l5"), (1, _ts(10), "l10"), (1, _ts(1), "l1")],
        "k bigint, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "r5"), (1, _ts(7), "r7")],
        "k bigint, ts timestamp, rv string",
    )
    out = {
        r["lbl"]: (r["rv"], r["ts_right"])
        for r in asof_join(
            left, right, key="k", ts="ts", right_cols=["rv"]
        ).collect()
    }
    assert out["l1"] == (None, None)  # nothing precedes t=1
    assert out["l5"] == ("r5", _ts(5))  # inclusive at equal ts
    assert out["l10"] == ("r7", _ts(7))  # nearest preceding, not first


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame(
        [(1, _ts(9), "a"), (2, _ts(9), "b")],
        "k bigint, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), "only-key-1")], "k bigint, ts timestamp, rv string"
    )
    out = {
        r["lbl"]: r["rv"]
        for r in asof_join(
            left, right, key="k", ts="ts", right_cols=["rv"]
        ).collect()
    }
    assert out == {"a": "only-key-1", "b": None}


def test_asof_tiebreak_last_wins(spark):
    # two right rows at the SAME (key, ts): ascending tiebreak, last wins
    left = spark.createDataFrame(
        [(1, _ts(8), "l")], "k bigint, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 1, "low"), (1, _ts(4), 9, "high")],
        "k bigint, ts timestamp, tb bigint, rv string",
    )
    rows = asof_join(
        left, right, key="k", ts="ts", right_cols=["rv"], tiebreak="tb"
    ).collect()
    assert rows[0]["rv"] == "high"
