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


def test_ngram_stop_shingle_df_cap_bounds_pairs(spark):
    """A boilerplate shingle present in > MAX_SHINGLE_DF docs must NOT pair
    every doc with every other (k² blowup); genuinely near-dup docs still
    pair via their sub-cap shingles."""
    k = dedup.MAX_SHINGLE_DF + 10
    stop = "all rights reserved"  # one shared 3-gram across all docs
    rows = [(i, f"{stop} unique{i} token{i} filler{i} body{i}") for i in range(k)]
    # plant one true near-dup pair sharing many rare shingles
    rows.append((1000, "alpha beta gamma delta epsilon zeta eta theta iota"))
    rows.append((1001, "alpha beta gamma delta epsilon zeta eta theta kappa"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, min_common=2).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1000, 1001) in found
    # without the cap the stop shingle alone yields k*(k-1)/2 candidates;
    # with it, no boilerplate-only pair survives (they share just 1 shingle
    # anyway, but the cap kills the candidate generation itself)
    assert all(a >= 1000 for a, _b in found), sorted(found)[:5]


def test_ngram_df_cap_matches_text_oracle(spark):
    """Hashed+capped Spark pairs == text-based capped pairs (collision-free
    at this scale): the hashing is a pure shuffle-size optimization."""
    rows = [
        (1, BASE), (2, NEAR), (3, OTHER), (4, OTHER2),
        (5, BASE.replace("quick", "rapid")),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["common"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    exp = {
        (a, b, c, j)
        for a, b, c, j in con.execute(dedup.SQL_NGRAM_JACCARD_PAIRS).fetchall()
    }
    assert got == exp


def test_simhash_hot_band_guard(spark):
    """> MAX_BUCKET docs sharing a band value (here: identical docs → all
    bands identical) must be dropped by the bucket guard instead of going
    quadratic; a small cluster still pairs up."""
    hot = [(i, OTHER) for i in range(dedup.MAX_BUCKET + 10)]
    small = [(2000, BASE), (2001, NEAR)]
    docs = spark.createDataFrame(hot + small, "doc_id bigint, text string")
    pairs = dedup.simhash_near_dups(docs, max_hamming=6).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (2000, 2001) in found
    # hot-bucket docs (exact dups — exact dedup's job, not simhash's) pruned
    assert all(a >= 2000 for a, _b in found), sorted(found)[:5]


def test_simhash_max_bucket_tunable(spark):
    """The bucket guard is a parameter: max_bucket=None disables it, so a
    small corpus whose every band is hot still reports its true near-dups."""
    hot = [(i, OTHER) for i in range(dedup.MAX_BUCKET + 10)]
    docs = spark.createDataFrame(hot, "doc_id bigint, text string")
    guarded = dedup.simhash_near_dups(docs, max_hamming=6).count()
    assert guarded == 0  # default guard drops the hot cluster
    unguarded = dedup.simhash_near_dups(
        docs, max_hamming=6, max_bucket=None
    ).count()
    n = len(hot)
    assert unguarded == n * (n - 1) // 2  # all pairs recovered
    # minhash exposes the same knob
    m = dedup.minhash_lsh_pairs(docs, max_bucket=None).count()
    assert m == n * (n - 1) // 2
    assert dedup.minhash_lsh_pairs(docs).count() == 0


def test_similarity_match_word_df_cap(spark):
    """J7 guard: with max_word_df, a stop word shared by every doc cannot
    drive the coverage join quadratic; matches via rare words survive."""
    from key_resource_table_extractor_spark.operators.relational import (
        similarity_match_join,
    )

    rows = []
    for i in range(120):
        src = "src0" if i % 2 == 0 else "src1"
        rows.append((i, src, f"common unique{i}"))  # na=2, stop-word cov 0.5
    rows.append((500, "src0", "alpha beta gamma delta"))
    rows.append((501, "src1", "alpha beta gamma epsilon"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in similarity_match_join(docs).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in similarity_match_join(docs, max_word_df=50).collect()
    }
    assert len(uncapped) > 50  # the stop word matches every src0 doc
    assert capped == {(500, 501)}, capped


def test_similarity_match_1to1(spark):
    """One-to-one J7 variant (reference seen-set greedy,
    table_extractor2_table_json_converter.py:168-178): each id_b is used at
    most once; contested id_b goes to the highest-coverage claimant
    (smallest id_a on ties); losers are dropped, not re-matched."""
    from key_resource_table_extractor_spark.operators.relational import (
        similarity_match_join,
        similarity_match_join_1to1,
    )

    rows = [
        # doc 10 covers b-500 fully (cov 1.0); doc 11 covers it at 0.75
        (10, "src0", "alpha beta gamma"),
        (11, "src0", "alpha beta gamma zeta"),
        (500, "src1", "alpha beta gamma"),
        # an unrelated clean pair
        (12, "src0", "mu nu xi"),
        (501, "src1", "mu nu xi omicron"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    many = similarity_match_join(docs).collect()
    # best-per-left lets one id_b serve many id_a
    assert [(r["id_a"], r["id_b"]) for r in many] == [
        (10, 500), (11, 500), (12, 501)
    ]
    one = similarity_match_join_1to1(docs).collect()
    assert [(r["id_a"], r["id_b"]) for r in one] == [(10, 500), (12, 501)]
    ids_b = [r["id_b"] for r in one]
    assert len(ids_b) == len(set(ids_b))


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


# --------------------------------------------------------------------------
# dup_passage_stats: passage-level duplication fractions
# --------------------------------------------------------------------------


def test_dup_passage_stats_planted_shared_passage(spark):
    # docs 1 and 2 share an identical 8-word opening passage; doc 3 shares
    # nothing. With n=5, the shared passage contributes 4 shared shingles.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one for the first document here"),
            (2, shared + " totally different ending words over there now"),
            (3, "nothing in common with anything else at all whatsoever"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.dup_passage_stats(docs).collect()}
    # shared 8-word prefix → shingles at offsets 0..3 are common to both
    assert rows[1]["n_dup_shingles"] == 4
    assert rows[2]["n_dup_shingles"] == 4
    assert rows[3]["n_dup_shingles"] == 0
    assert rows[3]["dup_fraction"] == 0.0
    for r in rows.values():
        assert 0.0 <= r["dup_fraction"] <= 1.0
        assert r["n_shingles"] >= r["n_dup_shingles"]


def test_dup_passage_stats_identical_docs_fraction_one(spark):
    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id bigint, text string"
    )
    for r in dedup.dup_passage_stats(docs).collect():
        assert r["dup_fraction"] == 1.0


# --------------------------------------------------------------------------
# dedup_clusters: connected components over fingerprint-collision edges
# --------------------------------------------------------------------------


def _pad(s):
    # make texts long enough that 40-char head/tail fingerprints are
    # independent regions
    return s + " filler" * 20


def test_boilerplate_removal_drops_recurring_sentences(spark):
    # a sentence shared by >df_cap docs is boilerplate; unique sentences
    # survive with their order (and therefore the reassembled text) intact
    boiler = "All rights reserved"
    rows = [
        (i, f"Unique opening {i}. {boiler}. Unique closing {i}")
        for i in range(5)
    ] + [(99, "Entirely unique document with no shared sentences")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept = dedup.remove_boilerplate(docs, df_cap=3).collect()
    by_doc = {}
    for r in kept:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["sent"]))
    for i in range(5):
        sents = [s for _p, s in sorted(by_doc[i])]
        assert sents == [f"Unique opening {i}", f"Unique closing {i}"]
    assert by_doc[99] == [
        (0, "Entirely unique document with no shared sentences")
    ]
    # normalization: case/whitespace variants count as the same sentence
    docs2 = spark.createDataFrame(
        [(i, f"Head {i}. all RIGHTS reserved") for i in range(5)],
        "doc_id bigint, text string",
    )
    kept2 = dedup.remove_boilerplate(docs2, df_cap=3).collect()
    assert all("rights" not in r["sent"].lower() for r in kept2)


def test_dedup_clusters_transitive_chain(spark):
    # A~B share a head fingerprint, B~C share a tail fingerprint: only the
    # transitive closure puts all three in ONE cluster keyed by min doc_id.
    head = "identical forty character opening text segment right here"
    tail = "matching forty character closing text segment right here"
    docs = spark.createDataFrame(
        [
            (10, head + " middle one " + "x" * 60 + " ending alpha alpha"),
            (20, head + " middle two " + "y" * 60 + " " + tail),
            (30, "different opening z " + "z" * 60 + " " + tail),
            (40, _pad("a singleton document unrelated to every other one")),
        ],
        "doc_id bigint, text string",
    )
    rows = dedup.dedup_clusters(docs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    assert got == {10: (10, 3), 20: (10, 3), 30: (10, 3)}  # 40 = singleton


def test_dedup_clusters_short_unique_doc_is_not_a_cluster(spark):
    # a UNIQUE doc shorter than fp_len has head fingerprint == tail
    # fingerprint: its key group holds 2 rows but only 1 distinct doc,
    # which must NOT surface as a spurious singleton "cluster"
    head = "identical forty character opening text segment right here"
    docs = spark.createDataFrame(
        [
            (1, "short unique doc under forty chars"),
            (3, head + " middle a " + "x" * 60),
            (4, head + " middle b " + "y" * 60),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in dedup.dedup_clusters(docs).collect()}
    assert got == {3: (3, 2), 4: (3, 2)}  # doc 1 absent


def test_dedup_clusters_no_edges_is_empty(spark):
    docs = spark.createDataFrame(
        [
            (1, "first all alone text " + "unique-a " * 20),
            (2, "second also alone " + "unique-b " * 20),
        ],
        "doc_id bigint, text string",
    )
    out = dedup.dedup_clusters(docs)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "cluster_id", "cluster_size",
    ]


def test_dedup_clusters_fuzz_matches_union_find(spark):
    # seeded fuzz: random head-group / tail-group assignments induce a
    # random bipartite collision graph; the operator must reproduce the
    # exact components of a pure-Python union-find ground truth.
    import numpy as np

    rng = np.random.RandomState(7)
    n = 120
    heads = rng.randint(0, 25, n)   # ~5 docs share each head fingerprint
    tails = rng.randint(0, 30, n)
    rows = []
    for i in range(n):
        # 40-char-stable head and tail regions, unique middle
        head = f"headgroup-{heads[i]:03d} " * 4
        tail = f"tailgroup-{tails[i]:03d} " * 4
        rows.append((i, f"{head} middle-{i} {tail}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    # ground truth: union-find over shared head or tail groups
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for key in (heads, tails):
        first = {}
        for i in range(n):
            k = key[i]
            if k in first:
                union(first[k], i)
            else:
                first[k] = i
    want = {}
    for i in range(n):
        want.setdefault(find(i), []).append(i)
    want_rows = {
        i: (min(members), len(members))
        for members in want.values()
        if len(members) > 1
        for i in members
    }

    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(docs).collect()
    }
    assert got == want_rows


def test_dedup_clusters_nonconvergence_raises(spark):
    # a transitive chain needs ~one propagation round per hop; with
    # max_iters=1 the fixpoint is unreachable and partial labels must NOT
    # be returned silently
    import pytest

    head = "identical forty character opening text segment right here"
    tail = "matching forty character closing text segment right here"
    docs = spark.createDataFrame(
        [
            (10, head + " middle one " + "x" * 60 + " ending alpha alpha"),
            (20, head + " middle two " + "y" * 60 + " " + tail),
            (30, "different opening z " + "z" * 60 + " " + tail),
        ],
        "doc_id bigint, text string",
    )
    with pytest.raises(RuntimeError, match="max_iters=1"):
        dedup.dedup_clusters(docs, max_iters=1)
    # and a sufficient budget still converges on the same input
    rows = dedup.dedup_clusters(docs).collect()
    assert {r["doc_id"] for r in rows} == {10, 20, 30}


def test_dedup_clusters_storage_bounded_across_invocations(spark):
    """Label-generation checkpoint blocks must not accumulate: after two
    full invocations, at most ONE final label generation (plus the edges
    cache slot) remains persisted beyond the baseline."""
    sc = spark.sparkContext

    def persisted_count():
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        n = 0
        while it.hasNext():
            it.next()
            n += 1
        return n

    head = "identical forty character opening text segment right here"
    tail = "matching forty character closing text segment right here"
    docs = spark.createDataFrame(
        [
            (10, head + " middle one " + "x" * 60 + " ending alpha alpha"),
            (20, head + " middle two " + "y" * 60 + " " + tail),
            (30, "different opening z " + "z" * 60 + " " + tail),
        ],
        "doc_id bigint, text string",
    )
    base = persisted_count()
    dedup.dedup_clusters(docs).collect()
    after_one = persisted_count()
    dedup.dedup_clusters(docs).collect()
    after_two = persisted_count()
    # invocations converge in >1 round; without per-round release the
    # count would grow by rounds+1 per call, and without the slot release
    # it would grow by 1 per call
    assert after_two <= after_one, (base, after_one, after_two)
    assert after_one - base <= 2, (base, after_one)


def test_simhash_arrow_vote_matches_expression(spark):
    """The round-8 numpy mapInArrow majority vote must be byte-identical
    to the catalyst HOF expression form it replaced, including the null
    and empty-text edge cases (null text folds to simhash 0 in both)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            ("d1", "hello world hello again and again"),
            ("d2", None),
            ("d3", ""),
            ("d4", "one"),
            ("d5", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        ],
        "doc_id string, text string",
    )
    hs = F.array_distinct(
        F.transform(dedup._words(), lambda w: F.xxhash64(w))
    )
    expr_form = F.expr(f"""
      aggregate(
        zip_with(
          transform(sequence(0, {dedup.SIMHASH_BITS - 1}), b ->
            size(filter(__hs, h -> ((h >> b) & 1) = 1))),
          sequence(0, {dedup.SIMHASH_BITS - 1}),
          (o, b) -> CASE WHEN o * 2 > size(__hs)
                         THEN shiftleft(CAST(1 AS BIGINT), b)
                         ELSE CAST(0 AS BIGINT) END),
        CAST(0 AS BIGINT), (acc, x) -> acc | x)
    """)
    exp = sorted(
        map(
            tuple,
            docs.withColumn("__hs", hs)
            .select("doc_id", expr_form.alias("simhash"))
            .collect(),
        )
    )
    got = sorted(map(tuple, dedup.simhash_df(docs).collect()))
    assert got == exp
