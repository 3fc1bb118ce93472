#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Queries are forced with a noop sink (full computation, no driver collect
cost). The flagship extraction runs over a synthesized spans corpus sized to
the documents table and reports docs/sec alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_revenue_nations",
    "event_sessions",
    "interval_union_islands",
    "median_stats_by_lang",
    "rank_topk_parts",
    "dedupe_prefix_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "token_counts_by_lang",
    "quality_scores_by_source",
    "doc_fingerprints",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_metadata",
    "extract_spans",
    "extract_spans_anchor",
    "extract_nested_colspans",
    "semantic_dedup",
    "dup_passage_stats",
    "dedup_clusters",
    "asof_view_attribution",
    "sequence_packing",
    "domain_mixture_sample",
    "bm25_topk",
    "chunk_documents",
    "media_embed",
    "curation_pipeline",
    "boilerplate_removal",
    "pii_redaction_stats",
    "ann_pq_topk",
    "bpe_train_stats",
]

# per-query time = min over N_PASSES CONSECUTIVE executions: the first
# pass warms the query's own codegen/exchange paths, so a single-pass
# reading carries +15-30% cold/noise (measured round 3 — a flat-board
# "regression" that vanished under best-of-3). Passes must run
# back-to-back per query, not as interleaved full sweeps: with ~30
# headline queries the generated-class/JIT state is evicted between a
# query's passes and the second pass re-pays compilation (measured:
# ngram 7.8s interleaved vs 5.1s consecutive on the same box state).
N_PASSES = 2


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry
    from key_resource_table_extractor_spark.session import build_session

    spark = build_session(
        app_name="krt-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm up off the clock: codegen, parquet reader, and python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, cpus * 10, numPartitions=cpus).mapInPandas(
        _noop, "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = entry.queries()
    times: dict[str, float] = {}
    n_docs = 0
    for name in HEADLINE:
        fn = qs[name]
        for _ in range(N_PASSES):
            t0 = time.time()
            df = fn(spark, sf_dir)
            force(df)
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
        if name == "extract_spans":
            n_docs = spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).count()

    total = round(sum(times.values()), 3)
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "passes": N_PASSES,
        "extraction_docs": n_docs,
        "extraction_docs_per_sec": (
            round(n_docs / times["extract_spans"], 2)
            if times.get("extract_spans")
            else None
        ),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
