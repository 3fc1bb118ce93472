"""Mixture-resampling semantics: quotas realize the target ratios at the
largest feasible size, never oversample a source, drop unweighted sources,
and pick rows deterministically (hash-rank, partitioning-independent)."""

from __future__ import annotations

from key_resource_table_extractor_spark.operators.relational import (
    domain_mixture_sample,
)


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_quotas_match_weights_at_largest_feasible_size(spark):
    # counts: a=30, b=10; weights 3:1 → N = min(30/3, 10/1) = 10,
    # quotas a=30, b=10 (everything fits exactly)
    docs = _docs(spark, {"a": 30, "b": 10})
    out = domain_mixture_sample(docs, {"a": 3.0, "b": 1.0})
    kept = {r: 0 for r in ("a", "b")}
    for row in out.collect():
        kept[row["source"]] += 1
    assert kept == {"a": 30, "b": 10}


def test_binding_source_caps_the_mixture(spark):
    # counts: a=100, b=5; weights 1:1 → N = 5 → both quotas 5
    docs = _docs(spark, {"a": 100, "b": 5})
    out = domain_mixture_sample(docs, {"a": 1.0, "b": 1.0})
    kept = {}
    for row in out.collect():
        kept[row["source"]] = kept.get(row["source"], 0) + 1
    assert kept == {"a": 5, "b": 5}


def test_unweighted_sources_dropped_and_selection_is_stable(spark):
    docs = _docs(spark, {"a": 20, "b": 20, "junk": 7})
    picked1 = domain_mixture_sample(docs, {"a": 2.0, "b": 1.0})
    picked2 = domain_mixture_sample(
        docs.repartition(7), {"a": 2.0, "b": 1.0}
    )
    ids1 = sorted(r["doc_id"] for r in picked1.collect())
    ids2 = sorted(r["doc_id"] for r in picked2.collect())
    assert ids1 == ids2  # partitioning-independent
    srcs = {r["source"] for r in picked1.collect()}
    assert "junk" not in srcs
    # N = min(20/2, 20/1) = 10 → quotas a=20, b=10
    assert len(ids1) == 30


def test_weighted_source_missing_from_corpus_makes_mixture_empty(spark):
    # a weighted source with zero corpus rows is infeasible at ANY size:
    # the contract returns empty, not a ratio-violating subset
    docs = _docs(spark, {"a": 100})
    out = domain_mixture_sample(docs, {"a": 1.0, "missing": 1.0})
    assert out.collect() == []
