"""Semantic oracles for the hash-based dedup operators (no SQL oracle —
engine-specific hash functions): planted near-duplicates must be recovered,
unrelated docs must not pair up."""

from __future__ import annotations

import pytest

from key_resource_table_extractor_spark.operators import dedup


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees "
    "near the quiet river bank under the bright morning sun"
)
NEAR = BASE.replace("morning", "evening")  # one-word edit → near-dup
OTHER = (
    "completely different content about spark partitions shuffles joins "
    "aggregations catalyst tungsten codegen arrow pandas vectorized "
    "execution plans statistics pruning pushdown adaptive skew salting"
)
OTHER2 = (
    "yet another unrelated document mentioning parquet iceberg metadata "
    "manifests snapshots schema evolution hidden partitioning time travel "
    "compaction clustering sorting zorder bloom filters dictionaries"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, OTHER2)],
        "doc_id bigint, text string",
    )


def test_minhash_lsh_recovers_planted_pair(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in found
    assert (3, 4) not in found


def test_simhash_recovers_planted_pair(spark, docs):
    pairs = dedup.simhash_near_dups(docs, max_hamming=6).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in found
    assert (3, 4) not in found


def test_ngram_jaccard_scores_planted_pair(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, min_common=2).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert by_pair.get((1, 2), 0.0) > 0.7
    assert (3, 4) not in by_pair


def test_minhash_signature_stability(spark, docs):
    """Signatures are deterministic across runs/partitionings."""
    s1 = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(dedup.MINHASH_PERMS))
        for r in dedup.minhash_signatures(docs).collect()
    }
    s2 = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(dedup.MINHASH_PERMS))
        for r in dedup.minhash_signatures(docs.repartition(3)).collect()
    }
    assert s1 == s2
