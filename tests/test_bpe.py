"""Semantic oracle for BPE tokenizer training: the distributed trainer
(word counts in Spark, merge loop on the compact statistic) must produce
the exact merge sequence of an independent pure-Python reference run on
the raw corpus, deterministically across partitionings."""

from __future__ import annotations

from collections import Counter

from key_resource_table_extractor_spark.operators import text as T

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower widest widest widest"),
    (2, "newest newest newest newest newest newest"),
    (3, "low lower newest"),
]


def _reference_bpe(texts, n_merges):
    # independent implementation (word counting + greedy merges), written
    # from the BPE definition — not by calling the operator's helpers
    wc = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wc[w] += 1
    seqs = {w: [*w, "</w>"] for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, f in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, f in pairs.items() if f == top)
        merges.append((rank, best[0], best[1], pairs[best]))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_independent_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    got = T.bpe_train(docs, n_merges=12)
    want = _reference_bpe([t for _i, t in CORPUS], 12)
    assert got == want
    # deterministic across partitionings
    got2 = T.bpe_train(docs.repartition(5), n_merges=12)
    assert got2 == got


def test_bpe_apply_counts_contract(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    # zero merges: every word stays fully split -> len(word)+1 symbols
    rows = {r["doc_id"]: r for r in T.bpe_apply_counts(docs, []).collect()}
    for did, t in CORPUS:
        ws = t.split()
        assert rows[did]["n_words"] == len(ws)
        assert rows[did]["n_subwords"] == sum(len(w) + 1 for w in ws)
    # trained merges compress: fewer subwords than fully-split, never
    # fewer than one token per word
    merges = T.bpe_train(docs, n_merges=12)
    rows2 = {
        r["doc_id"]: r for r in T.bpe_apply_counts(docs, merges).collect()
    }
    for did, t in CORPUS:
        ws = t.split()
        assert rows2[did]["n_subwords"] < rows[did]["n_subwords"]
        assert rows2[did]["n_subwords"] >= len(ws)
    # a fully-merged frequent word costs exactly 1 token
    one = spark.createDataFrame(
        [(9, "low low")], "doc_id bigint, text string"
    )
    m = T.bpe_train(one, n_merges=10)
    r = T.bpe_apply_counts(one, m).collect()[0]
    assert r["n_subwords"] == 2  # "low</w>" merged to a single symbol


def test_bpe_apply_string_ids_and_null_text(spark):
    # string doc_ids pass through un-narrowed; null text counts 0 words
    docs = spark.createDataFrame(
        [("doc_a", None), ("doc_b", "hello world")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in T.bpe_apply_counts(docs, []).collect()}
    assert rows["doc_a"]["n_words"] == 0
    assert rows["doc_a"]["n_subwords"] == 0
    assert rows["doc_b"]["n_words"] == 2


def test_bpe_empty_and_cap(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert T.bpe_train(empty) == []
    assert T.bpe_apply_counts(empty, []).collect() == []
    # the word cap keeps only the most frequent words
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    capped = T.bpe_train(docs, n_merges=5, max_words=1)
    # only "newest" (freq 7) survives the cap; merges come from it alone
    ref = _reference_bpe(["newest"] * 7, 5)
    assert capped == ref
