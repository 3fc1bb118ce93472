"""Packing invariants for the greedy fixed-length sequence packer: no bin
overflows, docs pack in doc_id order within a shard, oversized docs are
truncated into their own bin. The DuckDB gate cross-checks the full fold
against a recursive-CTE replay of the same greedy rule."""

from __future__ import annotations

from key_resource_table_extractor_spark.operators.text import (
    sequence_packing,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bins_never_overflow_and_order_is_greedy(spark):
    # one shard (shards=1): 4 docs of 3/4/4/2 words into seq_len=8
    docs = _docs(
        spark,
        [
            (0, "a b c"),          # bin 0 (fill 3)
            (1, "a b c d"),        # bin 0 (fill 7)
            (2, "a b c d"),        # 7+4>8 -> bin 1 (fill 4)
            (3, "a b"),            # bin 1 (fill 6)
        ],
    )
    out = {
        r["doc_id"]: r
        for r in sequence_packing(docs, seq_len=8, shards=1).collect()
    }
    assert [out[i]["bin_id"] for i in range(4)] == [0, 0, 1, 1]
    # per-bin fills respect the cap
    fills = {}
    for r in out.values():
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["tok"]
    assert all(v <= 8 for v in fills.values())


def test_oversized_doc_truncates_to_own_bin(spark):
    docs = _docs(
        spark,
        [(0, "w " * 50), (1, "a b")],  # 50 words > seq_len=8
    )
    out = {
        r["doc_id"]: r
        for r in sequence_packing(docs, seq_len=8, shards=1).collect()
    }
    assert out[0]["tok"] == 8  # truncated to seq_len
    assert out[0]["bin_id"] != out[1]["bin_id"]


def test_shards_pack_independently(spark):
    docs = _docs(spark, [(i, "a b c") for i in range(6)])
    out = sequence_packing(docs, seq_len=4, shards=2).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
        assert r["shard"] == r["doc_id"] % 2
    # each shard has 3 docs of 3 tokens, each in its own bin (3+3>4)
    for rows in by_shard.values():
        assert sorted(r["bin_id"] for r in rows) == [0, 1, 2]


def test_chunk_documents_windows_and_tail(spark):
    from key_resource_table_extractor_spark.operators.text import (
        chunk_documents,
    )

    # 10 tokens, chunk=4, overlap=1 -> starts 0,3,6,9; tail lengths 4,4,4,1
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id bigint, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts stop at dl - overlap: the would-be window at 9 is fully
    # contained in the window at 6 and must NOT be emitted
    assert [(r["start_tok"], r["n_tok"]) for r in rows] == [
        (0, 4), (3, 4), (6, 4),
    ]
    # short doc -> exactly one full-doc chunk
    short = spark.createDataFrame(
        [(2, "a b")], "doc_id bigint, text string"
    )
    srows = chunk_documents(short, chunk=4, overlap=1).collect()
    assert len(srows) == 1 and srows[0]["n_tok"] == 2
