"""Recall oracle for the LSH ANN operator: against brute-force cosine top-k
on the sf0.001 embeddings table, multi-probe LSH must reach decent recall."""

from __future__ import annotations

import pytest

from key_resource_table_extractor_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ann_recall_vs_bruteforce(spark, emb):
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    ann = similarity.ann_lsh_topk(emb, n_queries=10, k=k).collect()
    gold = {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    got = {}
    for r in ann:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_recall_vs_bruteforce(spark, emb):
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    ivf = similarity.ann_ivf_topk(emb, n_queries=10, k=k).collect()
    gold = {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    got = {}
    for r in ivf:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_pq_recall_vs_bruteforce(spark, emb):
    # ADC shortlist + exact re-rank: with a generous shortlist the exact
    # re-rank recovers the true top-k even under coarse quantization
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    pq = similarity.ann_pq_topk(emb, n_queries=10, k=k).collect()
    gold, got = {}, {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    for r in pq:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # re-ranked cos values are EXACT for the hits: they must equal the
    # brute-force values on the intersection
    bcos = {(r["query_id"], r["cand_id"]): r["cos"] for r in brute}
    for r in pq:
        key = (r["query_id"], r["cand_id"])
        if key in bcos:
            assert abs(r["cos"] - bcos[key]) < 1e-9, key


def test_local_topk_prune_preserves_global_topk(spark):
    # the generic two-stage utility: per-batch pre-top-n then the global
    # window equals the window alone, under any partitioning
    import numpy as np
    from pyspark.sql import Window, functions as F

    rng = np.random.RandomState(3)
    rows = [
        (int(q), int(c), float(rng.rand()))
        for q in range(4)
        for c in range(200)
    ]
    scored = spark.createDataFrame(
        rows, "query_id bigint, cand_id bigint, score double"
    ).repartition(7)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )

    def topk(df):
        return sorted(
            tuple(r)
            for r in df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 10)
            .collect()
        )

    pruned = similarity._local_topk_prune(
        scored, "query_id", ["score", "cand_id"], [False, True], 10
    )
    assert topk(pruned) == topk(scored)


def test_pq_result_invariant_to_partitioning(spark, emb):
    # the map-side per-batch pre-top-k keeps a SUPERSET of the global
    # shortlist under any batching, so the final top-k is identical
    # across partitionings
    a = [tuple(r) for r in similarity.ann_pq_topk(emb).collect()]
    b = [tuple(r) for r in similarity.ann_pq_topk(emb.repartition(7)).collect()]
    assert a == b and a


def test_pq_codes_deterministic(spark, emb):
    cbs1 = similarity.pq_codebooks(emb, dim=64)
    cbs2 = similarity.pq_codebooks(emb.repartition(5), dim=64)
    assert cbs1 == cbs2
    c1 = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in similarity.pq_codes(emb, cbs1).collect()
    )
    c2 = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in similarity.pq_codes(emb.repartition(3), cbs1).collect()
    )
    assert c1 == c2
    # every vector carries exactly M codes in [0, KSUB)
    for _vid, codes in c1:
        assert len(codes) == similarity.PQ_M
        assert all(0 <= c < similarity.PQ_KSUB for c in codes)


def test_ivf_kmeans_refinement(spark, emb):
    """One distributed Lloyd pass keeps recall and stays deterministic:
    refined centroids differ from the seeds (means moved) but are stable
    across partitionings."""
    seeds = similarity.ivf_centroids(emb)
    r1 = similarity.ivf_refined_centroids(emb)
    r2 = similarity.ivf_refined_centroids(emb.repartition(5))
    assert r1 != seeds  # the means actually moved
    for (c1, v1), (c2, v2) in zip(r1, r2):
        assert c1 == c2
        assert all(abs(a - b) < 1e-9 for a, b in zip(v1, v2))
    brute = similarity.cosine_topk(emb, n_queries=10, k=5).collect()
    ivf = similarity.ann_ivf_topk(
        emb, n_queries=10, k=5, refine_iterations=1
    ).collect()
    gold, got = {}, {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    for r in ivf:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_assignment_deterministic(spark, emb):
    """Centroids + assignments are stable across partitionings (pure
    function of vec_id hashes + vector values)."""
    c1 = similarity.ivf_centroids(emb)
    c2 = similarity.ivf_centroids(emb.repartition(7))
    assert c1 == c2
    a1 = sorted(
        (r["vec_id"], r["cid"])
        for r in emb.select(
            "vec_id",
            similarity.ivf_assign_expr(
                similarity.F.col("embedding"), c1
            ).alias("cid"),
        ).collect()
    )
    a2 = sorted(
        (r["vec_id"], r["cid"])
        for r in emb.repartition(3).select(
            "vec_id",
            similarity.ivf_assign_expr(
                similarity.F.col("embedding"), c1
            ).alias("cid"),
        ).collect()
    )
    assert a1 == a2
    # the Arrow kernel (the production path) agrees with the expression
    # scorer, which doubles as its independent oracle
    a3 = sorted(
        (r["vec_id"], r["cid"])
        for r in similarity.ivf_assign_arrow(emb, c1)
        .select("vec_id", "cid")
        .collect()
    )
    assert a3 == a1


def test_bruteforce_topk_self_consistency(spark, emb):
    out = similarity.cosine_topk(emb, n_queries=3, k=4).collect()
    assert len(out) == 12
    for r in out:
        assert -1.0001 <= r["cos"] <= 1.0001
    # ranks are dense per query and cos non-increasing
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rk"], r["cos"]))
    for q, lst in per_q.items():
        lst.sort()
        assert [rk for rk, _ in lst] == [1, 2, 3, 4]
        assert all(lst[i][1] >= lst[i + 1][1] for i in range(len(lst) - 1))


def test_semantic_dedup_plants_and_keeps(spark, emb):
    """SemDeDup oracle: planted exact-duplicate embeddings are dropped in
    favor of the smallest vec_id; sufficiently distinct vectors survive;
    output is deterministic under repartitioning."""
    from pyspark.sql import functions as F

    base = emb.limit(40)
    # plant exact duplicates of vectors 0 and 1 at high ids
    dup0 = base.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    dup1 = base.where(F.col("vec_id") == 1).select(
        (F.col("vec_id") + 10_001).alias("vec_id"), "embedding", "label"
    )
    docs = base.unionByName(dup0).unionByName(dup1)
    kept = similarity.semantic_dedup(docs, threshold=0.999).collect()
    kept_ids = {r["vec_id"] for r in kept}
    # originals kept, planted copies dropped
    assert 0 in kept_ids and 1 in kept_ids
    assert 10_000 not in kept_ids and 10_001 not in kept_ids
    # nothing else disappears at a near-exact threshold unless it has an
    # exact twin: all 40 base ids survive
    assert {r["vec_id"] for r in kept} == {
        r["vec_id"] for r in base.collect()
    }
    # deterministic under partitioning
    again = similarity.semantic_dedup(
        docs.repartition(5), threshold=0.999
    ).collect()
    assert sorted((r["vec_id"], r["cid"]) for r in kept) == sorted(
        (r["vec_id"], r["cid"]) for r in again
    )


def test_semantic_dedup_threshold_monotone(spark, emb):
    """Lowering the threshold can only drop MORE vectors (the kept set is
    anti-monotone in the threshold)."""
    strict = {
        r["vec_id"]
        for r in similarity.semantic_dedup(emb, threshold=0.99).collect()
    }
    loose = {
        r["vec_id"]
        for r in similarity.semantic_dedup(emb, threshold=0.6).collect()
    }
    assert loose <= strict
    # the keeper of any duplicate chain is its minimum: vec_id 0 never drops
    assert 0 in loose


def test_bm25_ranks_rare_term_overlap_first(spark):
    from key_resource_table_extractor_spark.operators.text import bm25_topk

    # query doc 0 contains rare term "zebra"; doc 10 shares it, doc 11
    # shares only ubiquitous terms -> doc 10 must outrank doc 11
    common = "the quick brown fox jumps over lazy dogs"
    docs = spark.createDataFrame(
        [
            (0, common + " zebra"),
            (10, common + " zebra indeed"),
            (11, common + " again and again"),
            (12, common),
            (13, common + " more filler words here"),
        ],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(docs, n_queries=1, k=4).collect()
    ranked = [r["cand_id"] for r in rows]
    assert ranked[0] == 10, ranked
    assert all(r["query_id"] == 0 for r in rows)
    # scores are non-increasing in rank
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_media_features_feed_ann_operators(spark):
    """embed_media's output schema slots into the similarity stack: its
    (vec_id, embedding) shape runs through brute-force cosine_topk."""
    from key_resource_table_extractor_spark.operators.multimodal import (
        embed_media,
    )
    from key_resource_table_extractor_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.createDataFrame(
        [(i, "word " * (5 + i)) for i in range(12)],
        "doc_id bigint, text string",
    )
    feats = embed_media(docs).selectExpr(
        "doc_id AS vec_id", "feature AS embedding"
    )
    rows = cosine_topk(feats, n_queries=2, k=3).collect()
    assert len(rows) == 6
    assert all(r["cos"] is not None for r in rows)


def test_media_resize_deterministic_and_bounded(spark):
    from key_resource_table_extractor_spark.operators.multimodal import (
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " * 30), (2, "x")],
        "doc_id bigint, text string",
    )
    a = {r["doc_id"]: bytes(r["payload"]) for r in resize_media(docs).collect()}
    b = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_media(docs.repartition(3)).collect()
    }
    assert a == b  # partitioning-independent
    # min 1 byte for any non-empty source payload
    assert all(len(p) >= 1 for p in a.values())
    # the reduced payload is a strict prefix of the original
    assert a[1] == ("alpha beta gamma " * 30).encode()[: len(a[1])]


def test_media_resize_oracle_ascii_assumption_holds():
    # SQL_MEDIA_RESIZE equates DuckDB's CHARACTER-prefix substr/md5(varchar)
    # with Spark's BYTE-prefix md5(binary) — valid only while every fixture
    # document is pure ASCII (byte prefix == char prefix). Pin the
    # assumption at both gate scales so a future non-ASCII fixture fails
    # HERE with the reason, not in the gate as an opaque hash mismatch.
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n = con.execute(
            f"SELECT count(*) FROM "
            f"parquet_scan('/root/testdata/{sf}/documents.parquet') "
            f"WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf}: {n} non-ASCII documents — SQL_MEDIA_RESIZE's "
            f"char-prefix oracle no longer matches Spark's byte prefix"
        )


def test_media_resize_large_payload_no_int32_overflow(spark):
    # a >2 MiB payload: nb * 1024 wraps negative in int32 — must compute
    # in int64 and produce the area-proportional slice, not 1 byte
    from key_resource_table_extractor_spark.operators.multimodal import (
        resize_media,
    )

    big = "word " * 600_000  # ~3 MB
    docs = spark.createDataFrame(
        [(1, big)], "doc_id bigint, text string"
    )
    row = resize_media(docs).collect()[0]
    nb = len(big.encode())
    w = 64 + nb % 512
    h = 64 + (nb * 7) % 512
    want = max((nb * 32 * 32) // (w * h), 1)
    assert len(bytes(row["payload"])) == want
    assert want > 1_000  # the int32-wrap symptom was a 1-byte payload


def test_media_resize_empty_payload_stays_empty(spark):
    from key_resource_table_extractor_spark.operators.multimodal import (
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "")], "doc_id bigint, text string"
    )
    row = resize_media(docs).collect()[0]
    assert bytes(row["payload"]) == b""


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.1"])
def test_derived_params_recall_two_sizes(spark, sf_dir):
    """Scale-parameterization regression (VERDICT r4 item 6): the
    corpus-derived IVF/PQ knobs (nlist ≈ √n, half-probe, ksub → n/8,
    shortlist ≈ 10·√n) must hold the recall contract at BOTH fixture
    corpus sizes, so the derivation can't silently rot as constants or
    corpora change."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    nlist, nprobe = similarity.derived_ivf_params(n)
    ksub, shortlist = similarity.derived_pq_params(n)
    assert nlist >= similarity.IVF_NLIST
    assert ksub >= similarity.PQ_KSUB
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    gold = {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        recs = [
            len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
        ]
        return sum(recs) / len(recs)

    ivf = similarity.ann_ivf_topk(
        emb, n_queries=10, k=k, nlist=nlist, nprobe=nprobe,
        refine_iterations=1,
    ).collect()
    assert recall(ivf) >= 0.6, (n, nlist, nprobe)
    pq = similarity.ann_pq_topk(
        emb, n_queries=10, k=k, ksub=ksub, shortlist=shortlist
    ).collect()
    assert recall(pq) >= 0.8, (n, ksub, shortlist)


def test_clustered_corpus_allows_narrow_probe(spark):
    """Evidence for the derivation docstring's claim: on a CLUSTERED
    corpus (the realistic case) a narrow probe (nlist//8) already meets
    the recall bar that the isotropic fixtures need a half-probe for —
    IVF's scanned fraction is a property of the data's cluster
    structure, not of the operator."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_clusters, per, dim = 20, 50, 32
    centers = rng.standard_normal((n_clusters, dim)) * 5.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per, dim)) * 0.3
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = len(rows)
    nlist, _half = similarity.derived_ivf_params(n)
    narrow = max(2, nlist // 8)
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    gold = {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    ivf = similarity.ann_ivf_topk(
        emb, n_queries=10, k=k, nlist=nlist, nprobe=narrow,
        refine_iterations=1,
    ).collect()
    got = {}
    for r in ivf:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.8, (nlist, narrow, recalls)


def test_derived_lsh_planes_keep_bucket_occupancy(spark):
    """Scale shape of the LSH derivation: plane count grows with the
    corpus so expected bucket occupancy stays near the target (the
    fixture floor would swallow 60M vectors per bucket at 10^9), and
    recall on a clustered corpus holds with the derived plane count."""
    import numpy as np

    assert similarity.derived_lsh_planes(500) == similarity.N_PLANES
    assert similarity.derived_lsh_planes(2000) == similarity.N_PLANES
    p9 = similarity.derived_lsh_planes(10**9)
    assert 20 <= p9 <= 26
    occupancy = 10**9 / (1 << p9)
    assert 30 <= occupancy <= 500  # near LSH_TARGET_BUCKET, not 60M
    # recall with a derived (larger) plane count on a clustered corpus
    rng = np.random.RandomState(4)
    n_clusters, per, dim = 16, 250, 32  # n=4000 → 5 planes
    centers = rng.standard_normal((n_clusters, dim)) * 5.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for p in centers[c] + rng.standard_normal((per, dim)) * 0.3:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_planes = similarity.derived_lsh_planes(len(rows))
    assert n_planes > similarity.N_PLANES
    k = 5
    brute = similarity.cosine_topk(emb, n_queries=10, k=k).collect()
    gold = {}
    for r in brute:
        gold.setdefault(r["query_id"], set()).add(r["cand_id"])
    got = {}
    for r in similarity.ann_lsh_topk(
        emb, n_queries=10, k=k, dim=dim, n_planes=n_planes
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(gold[q] & got.get(q, set())) / len(gold[q]) for q in gold
    ]
    assert sum(recalls) / len(recalls) >= 0.8, (n_planes, recalls)


def test_ivf_assignment_tie_break_with_duplicate_centroids(spark):
    """Duplicate vectors in the seeded centroid sample produce exact
    score ties; the Arrow kernel must break them exactly like the
    expression oracle (struct array_max → highest cid), or the
    cross-check — and cross-partitioning determinism — goes flaky."""
    rows = []
    base = [1.0, 0.0, 0.0, 0.0]
    for vid in range(40):
        # every vector identical → every centroid identical → all ties
        rows.append((vid, base))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb, 6)
    a_expr = sorted(
        (r["vec_id"], r["cid"])
        for r in emb.select(
            "vec_id",
            similarity.ivf_assign_expr(
                similarity.F.col("embedding"), cents
            ).alias("cid"),
        ).collect()
    )
    a_arrow = sorted(
        (r["vec_id"], r["cid"])
        for r in similarity.ivf_assign_arrow(emb, cents)
        .select("vec_id", "cid")
        .collect()
    )
    assert a_arrow == a_expr
    # all ties → everyone lands in the HIGHEST cid
    assert {cid for _v, cid in a_arrow} == {len(cents) - 1}


def test_ivf_probe_tie_break_matches_assignment(spark):
    """Query probe lists must break exact centroid-score ties toward the
    HIGHEST cid — the assignment convention. With identical vectors every
    centroid ties; assignment puts the whole corpus in the highest cid,
    so an nprobe=1 query that probed the LOWEST cid instead would scan an
    empty inverted list and return zero neighbors for its own duplicates."""
    rows = [(vid, [1.0, 0.0, 0.0, 0.0]) for vid in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.ann_ivf_topk(emb, n_queries=3, k=5, nlist=6, nprobe=1)
    per_query = {}
    for r in got.collect():
        per_query.setdefault(r["query_id"], []).append(r["cand_id"])
    assert set(per_query) == {0, 1, 2}
    assert all(len(c) == 5 for c in per_query.values()), per_query
