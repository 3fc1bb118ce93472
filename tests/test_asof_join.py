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


def test_asof_fuzz_matches_bruteforce(spark):
    # seeded fuzz: many keys, coarse timestamps (deliberate ties between
    # left and right, and MULTIPLE right rows at the same (key, ts) —
    # disambiguated by the tiebreak), checked row-by-row against a pure
    # Python brute force of the contract: the right row with max
    # (ts, tiebreak) such that ts <= left.ts.
    import numpy as np

    rng = np.random.RandomState(42)
    n_l, n_r, n_keys = 300, 200, 7
    lk = rng.randint(0, n_keys, n_l)
    lt = rng.randint(0, 40, n_l)  # coarse -> ties guaranteed
    rk = rng.randint(0, n_keys, n_r)
    rt = rng.randint(0, 40, n_r)
    left = spark.createDataFrame(
        [(int(i), int(lk[i]), _ts(int(lt[i]))) for i in range(n_l)],
        "lid bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(int(j), int(rk[j]), _ts(int(rt[j]))) for j in range(n_r)],
        "rid bigint, k bigint, ts timestamp",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, key="k", ts="ts", right_cols=["rid"],
            tiebreak="rid",
        ).collect()
    }
    for i in range(n_l):
        cands = [
            (int(rt[j]), int(j))
            for j in range(n_r)
            if rk[j] == lk[i] and rt[j] <= lt[i]
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, got[i], want)


def test_asof_null_ts_right_rows_never_match(spark):
    # a NULL-ts right row must not forward-fill (DuckDB ASOF contract:
    # l.ts >= NULL is never true); a NULL-ts left row gets no-match NULLs
    left = spark.createDataFrame(
        [(1, _ts(5), "l5"), (1, None, "lnull")],
        "k bigint, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, None, "rnull")], "k bigint, ts timestamp, rv string"
    )
    out = {
        r["lbl"]: r["rv"]
        for r in asof_join(
            left, right, key="k", ts="ts", right_cols=["rv"]
        ).collect()
    }
    assert out == {"l5": None, "lnull": None}


def test_asof_null_payload_travels_with_matched_row(spark):
    # the matched right row's NULL payload field must come back NULL, not
    # be filled from an OLDER right row (fields never mix across rows)
    left = spark.createDataFrame(
        [(1, _ts(10), "l")], "k bigint, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), "old-a", "old-b"), (1, _ts(8), None, "new-b")],
        "k bigint, ts timestamp, a string, b string",
    )
    row = asof_join(
        left, right, key="k", ts="ts", right_cols=["a", "b"]
    ).collect()[0]
    assert row["ts_right"] == _ts(8)
    assert row["a"] is None  # NOT "old-a"
    assert row["b"] == "new-b"


def test_asof_string_tiebreak_keeps_type(spark):
    # a string tiebreak must order as a string (not silently cast to NULL)
    left = spark.createDataFrame(
        [(1, _ts(8), "l")], "k bigint, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts(4), "aa", "first"), (1, _ts(4), "zz", "last")],
        "k bigint, ts timestamp, tb string, rv string",
    )
    rows = asof_join(
        left, right, key="k", ts="ts", right_cols=["rv"], tiebreak="tb"
    ).collect()
    assert rows[0]["rv"] == "last"
