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

from pyspark.sql import Window, functions as F

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
    docs = load(spark, sf_dir, "documents", rebalance=True)
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
# curated_corpus — the end-to-end training-data materializer: quality gate
# (length / token-count / stopword-ratio thresholds) then exact dedup
# (min-doc_id keeper per content fingerprint). The canonical composition a
# curation pipeline runs before tokenization; at 100 TB both stages are a
# map-side filter plus one short-key (md5) shuffle.
# --------------------------------------------------------------------------

MIN_DOC_TOKENS = 5
MIN_DOC_CHARS = 30
MIN_STOP_RATIO = 0.05  # English-ish prose signal; pure keyword-spam drops


def curated_corpus(docs, cols=("doc_id", "lang")):
    """Kept rows (``cols``; must include ``doc_id``, the keeper order)
    after the quality gate + exact dedup. The ONE implementation of the
    gate semantics — curation_pipeline reuses it with payload columns."""
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(_STOPWORDS_PAT))
    good = docs.where(
        (_tokens() >= MIN_DOC_TOKENS)
        & (F.length("text") >= MIN_DOC_CHARS)
        & ((stop / _tokens()) >= MIN_STOP_RATIO)
    )
    fp = F.md5(F.lower(F.col("text")))
    w_keep = Window.partitionBy("fp").orderBy("doc_id")
    return (
        good.select(*cols, fp.alias("fp"))
        .withColumn("rk", F.row_number().over(w_keep))
        .where(F.col("rk") == 1)
        .select(*cols)
    )


def q_curated_corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", rebalance=True)
    total = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept = curated_corpus(docs).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_kept"),
    )
    return (
        total.join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "first_kept",
        )
        .orderBy("lang")
    )


SQL_CURATED_CORPUS = """
WITH good AS (
  SELECT doc_id, lang, md5(lower(text)) AS fp
  FROM documents
  WHERE len(string_split_regex(trim(text), '\\s+')) >= 5
    AND length(text) >= 30
    AND CAST(len(regexp_extract_all(lower(text),
            '\\b(the|a|of|to|and|in|is|was|for)\\b')) AS DOUBLE)
        / len(string_split_regex(trim(text), '\\s+')) >= 0.05
), kept AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
    FROM good
  ) WHERE rk = 1
), per_lang AS (
  SELECT lang, count(*) AS n_kept, min(doc_id) AS first_kept
  FROM kept GROUP BY lang
)
SELECT d.lang, count(*) AS n_total,
       COALESCE(any_value(p.n_kept), 0) AS n_kept,
       any_value(p.first_kept) AS first_kept
FROM documents d LEFT JOIN per_lang p ON d.lang = p.lang
GROUP BY d.lang ORDER BY d.lang
"""


# --------------------------------------------------------------------------

def q_lang_guess_confusion(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", rebalance=True)
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


def q_vocab_top_ngrams(spark, sf_dir):
    """Vocabulary induction: top word-bigrams by DOCUMENT frequency (not
    raw count — df is the signal tokenizer/vocab pipelines rank by, and it
    is boilerplate-robust). Per-doc distinct first (map-side array op),
    then one short-key count; deterministic total order (df desc, ngram).
    At 100 TB the per-ngram partial counts aggregate map-side and only the
    (ngram, count) pairs shuffle — the classic vocab-count job."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    w = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
    )
    return (
        docs.where(F.size(w) >= 2)
        .select("doc_id", F.explode(F.array_distinct(bigrams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "ngram")
        .limit(50)
    )


SQL_VOCAB_TOP_NGRAMS = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wl FROM documents
), b AS (
  SELECT DISTINCT doc_id, array_to_string(wl[i:i+1], ' ') AS ngram
  FROM w, UNNEST(range(1, len(wl))) AS t(i)
  WHERE len(wl) >= 2
)
SELECT ngram, count(*) AS df
FROM b GROUP BY ngram ORDER BY df DESC, ngram LIMIT 50
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signal: per-doc repeated-bigram
    fraction (1 - distinct/total bigrams), aggregated per source. The
    fraction is a pure MAP-SIDE array expression (no explode, no shuffle
    beyond the final short-key agg) — the cheapest of the Gopher repetition
    rules, and the shape all of them share at 100 TB.

    Hash stability: ``avg`` over raw doubles sums in engine- and
    partition-dependent order, and ``round(·, 4)`` can flip at a half-ulp
    boundary between Spark and DuckDB (the repo's one red CORRECTNESS row
    in round 3). The per-doc fraction is therefore quantized to an exact
    scaled integer (×1e6, rounded) before aggregation — summing longs is
    order-independent — and both engines then perform the IDENTICAL
    double division and final round on the same exact sum. The
    "repetitive" threshold uses the same quantized value (> 100000 ⇔
    rep > 0.1 at 6-decimal granularity) so both engines share one rule."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    w = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
    )
    rep = 1 - F.size(F.array_distinct(bigrams)) / F.size(bigrams)
    rep6 = F.round(rep * F.lit(1000000.0)).cast("long")
    return (
        docs.where(F.size(w) >= 2)
        .select("source", rep6.alias("rep6"))
        .groupBy("source")
        .agg(
            F.round(
                F.sum("rep6").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                4,
            ).alias("avg_rep"),
            F.sum(
                F.when(F.col("rep6") > 100000, 1).otherwise(0)
            ).alias("n_repetitive"),
        )
        .orderBy("source")
    )


SQL_REPETITION_STATS = """
WITH b AS (
  SELECT source,
         CAST(round((1 - len(list_distinct(bl)) / CAST(len(bl) AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS rep6
  FROM (
    SELECT source,
           [array_to_string(wl[i:i+1], ' ')
            FOR i IN range(1, len(wl))] AS bl
    FROM (
      SELECT source, string_split_regex(trim(text), '\\s+') AS wl
      FROM documents
    ) WHERE len(wl) >= 2
  )
)
SELECT source,
       round(CAST(sum(rep6) AS DOUBLE) / count(*) / 1000000.0, 4) AS avg_rep,
       CAST(sum(CASE WHEN rep6 > 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive
FROM b GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# sequence packing — greedy fixed-length packing of tokenized documents
# --------------------------------------------------------------------------

PACK_SEQ_LEN = 256  # default training-sequence length; the query, the
# utilization denominator, and the SQL oracle all derive from this


def sequence_packing(
    docs, seq_len: int = PACK_SEQ_LEN, shards: int = 8,
    pretokenized: bool = False,
):
    """Pack tokenized documents into fixed-length training sequences — the
    step between a curated corpus and a training dataloader. Greedy
    next-fit in deterministic doc_id order within each shard: a document
    opens a new bin when it would overflow ``seq_len``; documents longer
    than ``seq_len`` are truncated to it (standard practice). Returns one
    row per document: (doc_id, shard, bin_id, n_tokens).

    Scale shape: sharding is ``doc_id % shards`` so packing parallelism is
    chosen independently of input partitioning (at 10^12 docs, shards ≈
    executors × a few); each shard packs with ONE pass over its docs
    inside ``applyInPandas`` — a running-sum-with-reset is inherently
    sequential, which is exactly why it is sharded rather than windowed
    (a global window would serialize the whole corpus through one task).
    Token counts are computed map-side with built-ins before the shuffle;
    only (doc_id, tok) pairs move. The DuckDB oracle replays the same
    greedy fold as a recursive CTE.

    ``pretokenized=True`` takes an already-counted ``(doc_id, tok)``
    frame (tok = least(whitespace tokens, seq_len), the same value this
    function would compute) — lets a caller that already paid the text
    pass (curation_pipeline's narrow meta) skip re-reading text.
    """
    import pandas as pd

    tok = (
        F.col("tok") if pretokenized
        else F.least(_tokens(), F.lit(seq_len))
    )
    toks = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).alias("shard"),
        tok.alias("tok"),
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        bins = []
        fill = seq_len + 1  # force a new bin on the first doc
        b = -1
        for t in pdf["tok"]:
            if fill + t > seq_len:
                b += 1
                fill = int(t)
            else:
                fill += int(t)
            bins.append(b)
        out = pdf[["doc_id", "shard", "tok"]].copy()
        out["bin_id"] = bins
        return out[["doc_id", "shard", "bin_id", "tok"]]

    return toks.groupBy("shard").applyInPandas(
        _pack, "doc_id bigint, shard bigint, bin_id bigint, tok bigint"
    )


def q_sequence_packing(spark, sf_dir):
    # bounded driver output: per-shard packing efficiency
    packed = sequence_packing(load(spark, sf_dir, "documents"))
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum("tok").alias("total_tokens"),
            F.round(
                F.sum("tok") / ((F.max("bin_id") + 1) * PACK_SEQ_LEN), 4
            ).alias("utilization"),
        )
        .orderBy("shard")
    )


SQL_SEQUENCE_PACKING = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         least(len(string_split_regex(trim(text), '\\s+')),
               {PACK_SEQ_LEN}) AS tok,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents
), pack(shard, rn, doc_id, tok, fill, bin_id) AS (
  SELECT shard, rn, doc_id, tok, tok, CAST(0 AS BIGINT)
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.tok,
         CASE WHEN p.fill + t.tok > {PACK_SEQ_LEN}
              THEN t.tok ELSE p.fill + t.tok END,
         CASE WHEN p.fill + t.tok > {PACK_SEQ_LEN}
              THEN p.bin_id + 1 ELSE p.bin_id END
  FROM pack p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       max(bin_id) + 1 AS n_bins,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(sum(tok) / ((max(bin_id) + 1) * {PACK_SEQ_LEN}), 4)
           AS utilization
FROM pack GROUP BY shard ORDER BY shard
"""


# --------------------------------------------------------------------------
# BM25 lexical retrieval — the inverted-index complement to the embedding
# ANN operators (find near-matches to probe/query documents by term
# statistics; the standard retrieval scorer for decontamination sweeps and
# eval-neighbor mining in training-data pipelines).
# --------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERIES = 5  # q_bm25_topk defaults; the SQL oracle derives from
BM25_K = 5          # these so the two cannot silently desynchronize


def bm25_topk(docs, n_queries: int = BM25_N_QUERIES, k: int = BM25_K):
    """Top-``k`` BM25-scored candidates per query document (queries = docs
    whose ``doc_id`` is BELOW ``n_queries`` — the driver tables' ids start
    at 0, so that is the first ``n_queries`` docs there; for a corpus with
    arbitrary ids, swap the predicate for a join against a probe table).

    Scale shape: classic inverted-index retrieval — term frequencies are
    one groupBy on (doc_id, hashed term); document frequency is a
    partial-agg groupBy on the hash; the query side is tiny (probes are
    ~10^5 against a 10^12 corpus) and BROADCAST onto the posting lists, so
    the corpus-side tf table never shuffles for the scoring join. The
    shuffled agg key is (query_id, cand_id). Ranking rounds the score to 6
    decimals before ordering (ties then break by cand_id) so last-ulp
    float-summation-order noise cannot flip ranks between engines.
    """
    wd = F.explode(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ).alias("wd")
    words = docs.select("doc_id", wd).select(
        "doc_id", F.xxhash64("wd").alias("h")
    )
    tf = words.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("tf"))
    dl = docs.select("doc_id", _tokens().alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    q = tf.where(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"), "h"
    )
    cand = (
        tf.join(F.broadcast(q), "h")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(df, "h")
        .join(dl.withColumnRenamed("doc_id", "cand_doc"),
              F.col("doc_id") == F.col("cand_doc"))
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        cand.select(
            "query_id", F.col("doc_id").alias("cand_id"),
            (idf * tf_part).alias("contrib"),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.sum("contrib").alias("score"))
    )
    rk_w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(rk_w))
        .where(F.col("rk") <= k)
        .select(
            "query_id", "cand_id", "rk", F.round("score", 4).alias("score")
        )
        .orderBy("query_id", "rk")
    )


def q_bm25_topk(spark, sf_dir):
    return bm25_topk(load(spark, sf_dir, "documents", rebalance=True))


SQL_BM25_TOPK = f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS wd
  FROM documents
), tf AS (
  SELECT doc_id, wd, count(*) AS tf FROM words GROUP BY doc_id, wd
), dl AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), df AS (
  SELECT wd, count(*) AS df FROM tf GROUP BY wd
), scored AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * c.tf * ({BM25_K1} + 1)
             / (c.tf + {BM25_K1} * (1 - {BM25_B}
                                    + {BM25_B} * dl.dl / s.avgdl)))
           AS score
  FROM tf q
  JOIN tf c ON q.wd = c.wd AND c.doc_id <> q.doc_id
  JOIN df ON df.wd = q.wd
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
  WHERE q.doc_id < {BM25_N_QUERIES}
  GROUP BY q.doc_id, c.doc_id
)
SELECT query_id, cand_id, rk, round(score, 4) AS score
FROM (
  SELECT query_id, cand_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, cand_id) AS rk
  FROM scored
) WHERE rk <= {BM25_K} ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# overlapping chunking — split documents into fixed-size token windows
# (the embedding/RAG-pipeline splitter; the inverse of sequence_packing,
# which JOINS short docs — this SPLITS long ones).
# --------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def chunk_documents(
    docs, chunk: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
):
    """One row per (doc, chunk window): windows of ``chunk`` tokens
    starting every ``chunk - overlap`` tokens (the final window may be
    shorter). Emits the window's position, length, and content md5 —
    the downstream embedding stage reads the fingerprinted slice, the
    lineage row stays small.

    Scale shape: pure map-side fan-out — one projection computes the
    token array once, ``posexplode`` over the start-position sequence
    emits the windows, nothing shuffles. Average output amplification is
    dl / (chunk - overlap) rows per doc, each O(1) wide.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    step = chunk - overlap
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(
        "doc_id", w.alias("wl"), F.size(w).alias("dl")
    ).select(
        "doc_id",
        "wl",
        "dl",
        # starts bound at dl - overlap (not dl): a start past that point
        # yields a window fully contained in the previous one — a
        # redundant duplicate chunk/embedding; coverage of the final
        # token is still guaranteed (s_max >= dl - chunk)
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("dl") - overlap - 1, F.lit(0)),
                F.lit(step),
            )
        ).alias("chunk_idx", "start_tok"),
    )
    sliced = F.slice(F.col("wl"), F.col("start_tok") + 1, chunk)
    return base.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.least(F.lit(chunk), F.col("dl") - F.col("start_tok")).alias(
            "n_tok"
        ),
        F.md5(F.concat_ws(" ", sliced)).alias("chunk_md5"),
    )


def q_chunk_documents(spark, sf_dir):
    return chunk_documents(load(spark, sf_dir, "documents", rebalance=True)).orderBy(
        "doc_id", "chunk_idx"
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS wl,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS dl
  FROM documents
), starts AS (
  SELECT doc_id, wl, dl,
         CAST(t.i / {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT) AS chunk_idx,
         t.i AS start_tok
  FROM base,
       UNNEST(range(0, greatest(dl - {CHUNK_OVERLAP}, 1),
                    {CHUNK_TOKENS - CHUNK_OVERLAP})) AS t(i)
)
SELECT doc_id, chunk_idx, CAST(start_tok AS INT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, dl - start_tok) AS INT) AS n_tok,
       md5(array_to_string(
           wl[start_tok + 1 : start_tok + {CHUNK_TOKENS}], ' '))
         AS chunk_md5
FROM starts ORDER BY doc_id, chunk_idx
"""


# --------------------------------------------------------------------------
# BPE tokenizer training — learn merge rules from the corpus, then apply
# them for subword token counting. The statistic BPE actually trains on is
# the WORD-FREQUENCY table (vocab-sized), so the 100 TB part — counting
# words — is one partial-agg short-key shuffle; the merge loop itself runs
# on the compact statistic (the fastBPE/HF-trainer structure). At web
# scale, cap the table to the top-V words by frequency (standard practice;
# the tail contributes negligible pair mass).
# --------------------------------------------------------------------------

BPE_N_MERGES = 20
BPE_MAX_WORDS = 10000  # top-V word-frequency cap (deterministic tiebreak)
BPE_EOW = "</w>"  # end-of-word marker symbol


def _bpe_merge_loop(word_freqs: list, n_merges: int) -> list:
    """Pure-Python greedy BPE on (word, freq) pairs: repeatedly merge the
    most frequent adjacent symbol pair (ties broken lexicographically so
    training is fully deterministic). Returns
    [(rank, left, right, freq)]. Shared by the operator (driver side,
    compact input) and the pytest oracle."""
    seqs = [
        (list(w) + [BPE_EOW], int(f)) for w, f in word_freqs if len(w) > 0
    ]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for sym, f in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # most frequent pair; ties broken by the lexicographically
        # smallest pair so training is fully deterministic
        top_f = max(counts.values())
        best = min(p for p, f in counts.items() if f == top_f)
        merges.append((rank, best[0], best[1], counts[best]))
        merged = best[0] + best[1]
        new_seqs = []
        for sym, f in seqs:
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, f))
        seqs = new_seqs
    return merges


def bpe_train(
    docs,
    n_merges: int = BPE_N_MERGES,
    max_words: int = BPE_MAX_WORDS,
) -> list:
    """Learn BPE merge rules from the corpus. Distributed part: the word
    count (map-side partial agg, one short-key shuffle) capped to the
    ``max_words`` most frequent words (freq desc, word asc — fully
    deterministic); driver part: the greedy merge loop over that compact
    table. Returns [(rank, left, right, freq)]."""
    wf = (
        docs.select(F.explode(_words_lower()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return _bpe_merge_loop([(r["w"], r["f"]) for r in wf], n_merges)


def _words_lower():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def bpe_apply_counts(docs, merges: list):
    """Apply trained merges and count subword tokens per doc — MAP-SIDE
    (mapInPandas; the merge table rides the closure, the corpus never
    shuffles). Returns (doc_id, n_subwords, n_words)."""
    import pandas as pd

    ranks = {(m[1], m[2]): m[0] for m in merges}

    def encode_word(w: str) -> int:
        sym = list(w) + [BPE_EOW]
        while len(sym) > 1:
            best, bi = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        return len(sym)

    def fn(batches):
        # per-task memo of the pure word -> subword-count function:
        # corpora repeat words massively (type/token ratio), so encoding
        # each DISTINCT word once and summing dict lookups replaces the
        # per-occurrence merge scan (guide §4.5 — amortize heavy work
        # across the task; at sf1 this is 31 encodes for 2.7M words)
        memo: dict[str, int] = {}
        memo_get = memo.get
        for pdf in batches:
            toks, nw = [], []
            for t in pdf["text"]:
                # null text tokenizes to zero words (str(None) would count
                # the literal word "none"), matching the Spark-side
                # convention where split(null) drops the row
                ws = (
                    []
                    if pd.isna(t)
                    else [w for w in str(t).strip().lower().split() if w]
                )
                nw.append(len(ws))
                tot = 0
                for w in ws:
                    v = memo_get(w)
                    if v is None:
                        v = encode_word(w)
                        memo[w] = v
                    tot += v
                toks.append(tot)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_subwords": pd.Series(toks, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                }
            )

    # doc_id DDL follows the input schema — string extraction-side ids
    # must pass through un-narrowed (same contract as minhash_signatures)
    id_type = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInPandas(
        fn, f"doc_id {id_type}, n_subwords bigint, n_words bigint"
    )


def q_bpe_train_stats(spark, sf_dir):
    """Rows-only driver query: the learned merge table (rank, left,
    right, freq) plus corpus-level fertility under the learned merges.
    No SQL oracle — BPE's greedy loop is not SQL-expressible; the
    semantic oracle is tests/test_bpe.py (exact merge-sequence equality
    with an independent pure-Python reference, plus determinism)."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    merges = bpe_train(docs)
    tot = bpe_apply_counts(docs, merges).agg(
        F.sum("n_subwords").alias("total_subwords"),
        F.sum("n_words").alias("total_words"),
    ).first()
    ts = int(tot["total_subwords"] or 0)
    tw = int(tot["total_words"] or 0)
    return spark.createDataFrame(
        [(r, l, rt, f, ts, tw) for (r, l, rt, f) in merges],
        "rank int, left string, right string, freq bigint, "
        "total_subwords bigint, total_words bigint",
    ).orderBy("rank")


# --------------------------------------------------------------------------
# PII detection / redaction — the safety pass every released training corpus
# runs: count and mask emails, phone numbers, and IPv4 addresses. Patterns
# are lookahead-free so the Java (Spark) and RE2 (DuckDB) engines agree;
# replacement is global in both. The synthetic corpus carries no organic
# PII, so the gate query deterministically seeds doc_id-derived PII into
# the text first — the seeding is part of the query and mirrored verbatim
# in the oracle, giving the operator real work to be checked on.
# --------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(col):
    """Masked text: emails → [EMAIL], then phones → [PHONE], then IPv4 →
    [IP] (fixed order, so engines can't diverge on overlap handling)."""
    out = F.regexp_replace(col, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IP, "[IP]")


def q_pii_redaction_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", rebalance=True)
    did = F.col("doc_id")
    seeded = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 415-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    # one-element explode barrier: `seeded` rebuilds the full document
    # string, and CollapseProject would re-inline it into each of the
    # four consumers below (three regexp counts + the redaction) — as a
    # Generate output attribute it materializes once per row
    s = F.col("__s")
    per_doc = docs.select(
        "source", F.explode(F.array(seeded)).alias("__s")
    ).select(
        "source",
        F.regexp_count(s, F.lit(PII_EMAIL)).alias("e"),
        F.regexp_count(s, F.lit(PII_PHONE)).alias("p"),
        F.regexp_count(s, F.lit(PII_IP)).alias("i"),
        F.length(redact_pii(s)).alias("rlen"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").cast("long").alias("n_emails"),
            F.sum("p").cast("long").alias("n_phones"),
            F.sum("i").cast("long").alias("n_ips"),
            F.sum(
                F.when(F.col("e") + F.col("p") + F.col("i") > 0, 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_docs_with_pii"),
            F.sum("rlen").cast("long").alias("redacted_len"),
        )
        .orderBy("source")
    )


SQL_PII_REDACTION_STATS = f"""
WITH seeded AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 415-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' host 10.' || (doc_id % 256) || '.0.'
                      || (doc_id % 100)
                 ELSE '' END AS s
  FROM documents
), per_doc AS (
  SELECT source,
         len(regexp_extract_all(s, '{PII_EMAIL}')) AS e,
         len(regexp_extract_all(s, '{PII_PHONE}')) AS p,
         len(regexp_extract_all(s, '{PII_IP}')) AS i,
         length(regexp_replace(regexp_replace(regexp_replace(s,
                 '{PII_EMAIL}', '[EMAIL]', 'g'),
                 '{PII_PHONE}', '[PHONE]', 'g'),
                 '{PII_IP}', '[IP]', 'g')) AS rlen
  FROM seeded
)
SELECT source, count(*) AS n_docs,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(i) AS BIGINT) AS n_ips,
       CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_with_pii,
       CAST(sum(rlen) AS BIGINT) AS redacted_len
FROM per_doc GROUP BY source ORDER BY source
"""


QUERIES = {
    "token_counts_by_lang": q_token_counts_by_lang,
    "sequence_packing": q_sequence_packing,
    "bm25_topk": q_bm25_topk,
    "chunk_documents": q_chunk_documents,
    "vocab_top_ngrams": q_vocab_top_ngrams,
    "repetition_stats": q_repetition_stats,
    "subword_token_stats": q_subword_token_stats,
    "curated_corpus": q_curated_corpus,
    "quality_scores_by_source": q_quality_scores_by_source,
    "lang_guess_confusion": q_lang_guess_confusion,
    "doc_fingerprints": q_doc_fingerprints,
    "pii_redaction_stats": q_pii_redaction_stats,
    "bpe_train_stats": q_bpe_train_stats,
}

ORACLE = {
    "token_counts_by_lang": SQL_TOKEN_COUNTS_BY_LANG,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "bm25_topk": SQL_BM25_TOPK,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "vocab_top_ngrams": SQL_VOCAB_TOP_NGRAMS,
    "repetition_stats": SQL_REPETITION_STATS,
    "subword_token_stats": SQL_SUBWORD_TOKEN_STATS,
    "curated_corpus": SQL_CURATED_CORPUS,
    "quality_scores_by_source": SQL_QUALITY_SCORES_BY_SOURCE,
    "lang_guess_confusion": SQL_LANG_GUESS_CONFUSION,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "pii_redaction_stats": SQL_PII_REDACTION_STATS,
}
