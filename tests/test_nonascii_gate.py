"""Gate replica on a MULTI-BYTE corpus: the byte-vs-char guards
(`octet_length(encode(text))` in multimodal oracles), the PII patterns,
and every text/dedup hash path are verified only on pure-ASCII fixtures
by the driver (the /root/testdata tables are ASCII-only), so a silent
ASCII assumption — byte-based substring in an oracle, a hash over a
locale-dependent casefold — would never be caught there. This module
rebuilds a documents table containing CJK, emoji, Cyrillic, Arabic,
combining accents, and multi-byte near-duplicate pairs, then runs the
doc-family driver queries against their own DuckDB oracles on it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

# doc-family queries whose q_/SQL pair reads only the documents table;
# chosen to cover the flagged guards: encode/octet_length (media_*),
# PII regexes, md5 fingerprints over casefolds, shingle hashing,
# quantized repetition stats, token/char ratios
QUERIES = [
    "token_counts_by_lang",
    "quality_scores_by_source",
    "doc_fingerprints",
    "pii_redaction_stats",
    "dedupe_prefix_fingerprint",
    "ngram_jaccard_pairs",
    "dup_passage_stats",
    "repetition_stats",
    "media_metadata",
    "media_resize",
    "media_embed",
    "media_frame_sample",
    "subword_token_stats",
    "lang_guess_confusion",
    "vocab_top_ngrams",
    "curated_corpus",
    "chunk_documents",
    "sequence_packing",
    "boilerplate_removal",
    "curation_pipeline",
]

NONASCII_DOCS = [
    # (text, lang, source) — doc_id/n_chars assigned in the fixture
    ("数据 管道 在 大规模 集群 上 运行 重复 数据 删除 和 相似 搜索 流程",
     "zh", "src0"),
    ("数据 管道 在 大规模 集群 上 运行 重复 数据 删除 和 相似 搜索 管道",
     "zh", "src1"),  # near-dup of the previous (one token differs)
    ("Les données dupliquées coûtent cher à grande "
     "échelle données dupliquées coûtent cher",
     "fr", "src0"),
    ("поток данных "
     "обрабатывает "
     "дубликаты поток "
     "данных", "ru", "src2"),
    ("معالجة البيانات "
     "على نطاق واسع معالجة "
     "البيانات", "ar", "src1"),
    ("pipeline \U0001f680 dedup \U0001f9ea tokens → batches "
     "\U0001f680 dedup stream \U0001f9ea tokens", "en", "src2"),
    ("café résumé naivë deduplication of "
     "café résumé rows", "fr", "src3"),
    ("contact 云用户 at unicode.user@example.com or call "
     "555-867-5309 云用户 again", "zh", "src3"),
]


@pytest.fixture(scope="module")
def na_dir(tmp_path_factory, spark):
    """sf0.001 documents + the multi-byte docs, written as one parquet."""
    base = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("nonascii_sf")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM "
        f"parquet_scan('{base}/documents.parquet')"
    ).fetchall()
    next_id = max(r[0] for r in rows) + 1
    for k, (text, lang, source) in enumerate(NONASCII_DOCS):
        rows.append((next_id + k, text, lang, source, len(text)))
    pdf = __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    dest = os.path.join(str(out), "documents.parquet")
    con.execute("CREATE TABLE t AS SELECT * FROM pdf")
    con.execute(
        f"COPY (SELECT * FROM t ORDER BY doc_id) TO '{dest}' "
        f"(FORMAT PARQUET)"
    )
    return str(out)


@pytest.fixture(scope="module")
def na_duck(na_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{na_dir}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util as iu

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__spark_entry__.py")
    spec = iu.spec_from_file_location("spark_entry_na", path)
    m = iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 9)
        return v

    body = sorted(
        (tuple(cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )
    return sorted(cols), body


def test_corpus_is_genuinely_multibyte(na_duck):
    n = na_duck.execute(
        "SELECT count(*) FROM documents "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n >= len(NONASCII_DOCS)


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_duckdb_on_multibyte(spark, entry_mod, na_duck,
                                           na_dir, name):
    sdf = entry_mod.queries()[name](spark, na_dir)
    scols, srows = _norm([c.lower() for c in sdf.columns],
                         [tuple(r) for r in sdf.collect()])
    res = na_duck.execute(entry_mod.oracle_sql()[name])
    dcols, drows = _norm([d[0].lower() for d in res.description],
                         res.fetchall())
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows


def test_near_dup_pair_detected_across_engines(spark, entry_mod, na_duck,
                                               na_dir):
    """The planted CJK near-duplicate pair must actually surface in the
    jaccard pairs output (the multi-byte shingles do real work, not just
    pass through)."""
    sdf = entry_mod.queries()["ngram_jaccard_pairs"](spark, na_dir)
    rows = [tuple(r) for r in sdf.collect()]
    zh_ids = na_duck.execute(
        "SELECT doc_id FROM documents WHERE lang = 'zh' "
        "AND text LIKE '%大规模%' ORDER BY doc_id"
    ).fetchall()
    a, b = zh_ids[0][0], zh_ids[1][0]
    assert any(
        {r[0], r[1]} == {a, b} for r in rows
    ), f"planted zh near-dup ({a},{b}) not found in {rows[:10]}"
