"""End-to-end invariants of the composed curation pipeline on a crafted
corpus: the quality gate drops junk, exact and near-dup losers vanish
(keeper = min doc_id), mixture quotas hold exactly, and no packed bin
overflows the sequence length. The DuckDB value oracle is
scripts/check_queries.py / the driver gate (SQL_CURATION_PIPELINE);
these tests pin the SEMANTICS stage by stage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from key_resource_table_extractor_spark.operators.curation import (
    curation_pipeline,
)

# ≥5 tokens, ≥30 chars, stopword ratio ≥0.05 — passes the quality gate
_PROSE = "the quick brown fox jumps over the lazy dog in a sunny field"
# shared 40-char opening (near-dup head fingerprint collides)
_HEAD = "identical forty character opening text segment right here "


def _corpus(spark):
    # every clean doc opens AND closes uniquely (head/tail fingerprints
    # must not collide across unrelated docs), except the planted pairs
    rows = []
    for i in range(8):  # srcA: 8 clean docs
        rows.append(
            (100 + i, "srcA",
             f"srcA doc {i} begins: {_PROSE} marker {100 + i}")
        )
    for i in range(6):  # srcB: 6 clean docs
        rows.append(
            (200 + i, "srcB",
             f"srcB doc {i} begins: {_PROSE} marker {200 + i}")
        )
    # exact dup of doc 200 (byte-identical text)
    rows.append((250, "srcB", f"srcB doc 0 begins: {_PROSE} marker 200"))
    # near-dup pair: shared 40-char opening, different endings
    rows.append((251, "srcB", _HEAD + _PROSE + " tail one"))
    rows.append((252, "srcB", _HEAD + _PROSE + " tail two quite changed"))
    # quality-gate victims: too short / no stopwords
    rows.append((300, "srcA", "short"))
    rows.append((301, "srcB", "keyword spam spam spam spam spam spam spam"))
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def test_curation_pipeline_stage_invariants(spark):
    docs = _corpus(spark)
    weights = {"srcA": 1.0, "srcB": 2.0}
    packed = curation_pipeline(docs, weights, seq_len=64, shards=2)
    rows = packed.collect()
    kept = {r["doc_id"] for r in rows}

    # quality-gate victims and dup losers are gone; keepers are min ids
    assert 300 not in kept and 301 not in kept
    assert 250 not in kept  # exact dup of 200
    assert 252 not in kept  # near-dup cluster keeper is 251
    assert 200 in kept

    # mixture quotas hold exactly: keepers are 8 srcA + 7 srcB (200-205 +
    # 251), so N = floor(min(8/1, 7/2)) = 3 → quota srcA=3, srcB=6
    srcs = {100 + i for i in range(8)}
    n_a = len(kept & srcs)
    n_b = len(kept - srcs)
    assert n_a == 3 and n_b == 6, (n_a, n_b)

    # packing: no bin exceeds seq_len; bins are dense per shard
    for (shard, bin_id), grp in _group(rows):
        assert sum(g["tok"] for g in grp) <= 64
    for shard in {r["shard"] for r in rows}:
        bins = sorted({r["bin_id"] for r in rows if r["shard"] == shard})
        assert bins == list(range(len(bins)))


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault((r["shard"], r["bin_id"]), []).append(r)
    return out.items()


def test_curation_pipeline_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id bigint, source string, text string")
    out = curation_pipeline(empty, {"srcA": 1.0})
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "shard", "bin_id", "tok",
    ]


def test_curation_pipeline_repeated_calls(spark):
    # the dedup_clusters consume-before-next-call contract must hold when
    # the whole pipeline is invoked back-to-back (bench best-of-N shape)
    docs = _corpus(spark)
    weights = {"srcA": 1.0, "srcB": 2.0}
    a = sorted(tuple(r) for r in curation_pipeline(docs, weights, seq_len=64, shards=2).collect())
    b = sorted(tuple(r) for r in curation_pipeline(docs, weights, seq_len=64, shards=2).collect())
    assert a == b and a
