"""Text-analysis operators for a training-data pipeline over `documents`.

- token counting (whitespace tokenizer — SURVEY §2 C3)
- quality scoring (length / punctuation / stopword ratios)
- language-ID heuristic (stopword density n-gram-style rule)
- document fingerprinting (normalized-text hash; rolling-hash stand-in
  expressible identically in Spark and DuckDB)

All four are pure built-in-function plans (JVM-side, whole-stage codegen) —
no Python UDFs — so they hold up at 100 TB: one scan, map-side partial
aggregation, tiny shuffle of group keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

_STOPWORDS_PAT = r"\b(the|a|of|to|and|in|is|was|for)\b"


def _tokens():
    return F.size(F.split(F.trim(F.col("text")), r"\s+"))


# --------------------------------------------------------------------------

def q_token_counts_by_lang(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", _tokens().alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


SQL_TOKEN_COUNTS_BY_LANG = """
WITH t AS (
  SELECT lang, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens, max(n_tokens) AS max_tokens
FROM t GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# subword (BPE-ish) token counting — the GPT-2-style pretokenizer split
# (contractions | space-prefixed letter runs | digit runs | punct runs),
# lookahead-free so the Java-regex (Spark) and RE2 (DuckDB) engines agree.
# Token budgeting for LLM training data counts subwords, not words.
# --------------------------------------------------------------------------

_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def q_subword_token_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sub = F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_PAT))
    ws = _tokens()
    return (
        docs.select("lang", sub.alias("n_sub"), ws.alias("n_ws"))
        .groupBy("lang")
        .agg(
            F.sum("n_sub").cast("bigint").alias("total_subwords"),
            F.round(F.avg("n_sub"), 4).alias("avg_subwords"),
            # fertility: subword tokens per whitespace word (tokenizer
            # quality signal in training-data pipelines)
            F.round(F.sum("n_sub") / F.sum("n_ws"), 4).alias("fertility"),
        )
        .orderBy("lang")
    )


SQL_SUBWORD_TOKEN_STATS = """
WITH t AS (
  SELECT lang,
         len(regexp_extract_all(lower(text),
             '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+'))
           AS n_sub,
         len(string_split_regex(trim(text), '\\s+')) AS n_ws
  FROM documents
)
SELECT lang, CAST(sum(n_sub) AS BIGINT) AS total_subwords,
       round(avg(n_sub), 4) AS avg_subwords,
       round(CAST(sum(n_sub) AS DOUBLE) / sum(n_ws), 4) AS fertility
FROM t GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------

def q_quality_scores_by_source(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    length = F.length("text")
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(_STOPWORDS_PAT))
    scored = docs.select(
        "source",
        length.alias("len"),
        _tokens().alias("n_tokens"),
        F.round(stop / _tokens(), 6).alias("stop_ratio"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("len"), 4).alias("avg_len"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("source")
    )


SQL_QUALITY_SCORES_BY_SOURCE = """
WITH scored AS (
  SELECT source, length(text) AS len,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         round(len(regexp_extract_all(lower(text),
               '\\b(the|a|of|to|and|in|is|was|for)\\b'))
               / len(string_split_regex(trim(text), '\\s+')), 6) AS stop_ratio
  FROM documents
)
SELECT source, count(*) AS n_docs, round(avg(len), 4) AS avg_len,
       round(avg(stop_ratio), 6) AS avg_stop_ratio,
       round(avg(n_tokens), 4) AS avg_tokens
FROM scored GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------

def q_lang_guess_confusion(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(_STOPWORDS_PAT))
    pred = F.when(stop >= 3, F.lit("en")).otherwise(F.lit("other"))
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


SQL_LANG_GUESS_CONFUSION = """
WITH p AS (
  SELECT lang,
         CASE WHEN len(regexp_extract_all(lower(text),
              '\\b(the|a|of|to|and|in|is|was|for)\\b')) >= 3
              THEN 'en' ELSE 'other' END AS pred_lang
  FROM documents
)
SELECT lang, pred_lang, count(*) AS n
FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


# --------------------------------------------------------------------------

def q_doc_fingerprints(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
        )
        .orderBy("source")
    )


SQL_DOC_FINGERPRINTS = """
WITH f AS (
  SELECT source, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM documents
)
SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct_fp
FROM f GROUP BY source ORDER BY source
"""


QUERIES = {
    "token_counts_by_lang": q_token_counts_by_lang,
    "subword_token_stats": q_subword_token_stats,
    "quality_scores_by_source": q_quality_scores_by_source,
    "lang_guess_confusion": q_lang_guess_confusion,
    "doc_fingerprints": q_doc_fingerprints,
}

ORACLE = {
    "token_counts_by_lang": SQL_TOKEN_COUNTS_BY_LANG,
    "subword_token_stats": SQL_SUBWORD_TOKEN_STATS,
    "quality_scores_by_source": SQL_QUALITY_SCORES_BY_SOURCE,
    "lang_guess_confusion": SQL_LANG_GUESS_CONFUSION,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
}
