"""End-to-end training-data curation pipeline — the composition a real
user runs, chained from the individually-gated operators:

    quality gate + exact dedup   (curated_corpus semantics, text.py)
  → near-dup cluster keeper election  (dedup_clusters, dedup.py)
  → domain-mixture resampling    (domain_mixture_sample, relational.py)
  → fixed-length sequence packing     (sequence_packing, text.py)

Per-operator gates can't see interface frictions (column contracts, the
dedup_clusters consume-before-next-call rule, quota feasibility on a
gated sub-corpus); this single driver query runs the whole chain against
one DuckDB oracle that chains the same CTEs.

Scale shape is the union of the stages' shapes: the quality gate is
map-side; exact dedup is one short-key (md5) shuffle; cluster election
is star-edge label propagation (bounded rounds, one generation of state);
the mixture quota side stays broadcast; packing shards by ``doc_id %
shards`` so its sequential fold parallelizes independently of input
partitioning. No stage widens rows — text is dropped after token
counting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load
from .dedup import dedup_clusters
from .relational import (
    _MIXTURE_VALUES,
    MIXTURE_WEIGHTS,
    domain_mixture_sample,
)
from .text import (
    curated_corpus,
    MIN_DOC_CHARS,
    MIN_DOC_TOKENS,
    MIN_STOP_RATIO,
    PACK_SEQ_LEN,
    sequence_packing,
)


def curation_pipeline(
    docs,
    weights: dict[str, float],
    seq_len: int = PACK_SEQ_LEN,
    shards: int = 8,
    fp_len: int = 40,
):
    """Run the full curation chain; returns packed rows
    (doc_id, shard, bin_id, tok) for the surviving documents.

    ``docs`` needs (doc_id, source, text). Keeper election keeps every
    doc that is not in a near-dup cluster plus each cluster's min doc_id
    (``cluster_id == doc_id``). The returned frame inherits
    ``dedup_clusters``'s contract: consume it before the next
    ``curation_pipeline``/``dedup_clusters`` call on the same session.
    """
    # Round-8 shape: every downstream decision depends only on the two
    # cluster fingerprints, the source, and the token count — never on
    # text (guide §8: decide on small rows). So the gate + exact-dedup
    # window runs ONCE, projects to a narrow per-doc meta row (~60 B),
    # and THAT is persisted for the five consumers (cluster roots/member,
    # keeper anti join, mixture count + rank, packing). The round-5 A/B
    # that rejected persisting applied to the WIDE text-bearing table
    # (cache write of the payload cost more than recomputing the gate);
    # the narrow meta inverts it: sf1 A/B 9.1s → 4.3s.
    from .dedup import _persist_bounded, dedup_clusters_from_keys
    from .text import _tokens

    exact = curated_corpus(docs, cols=("doc_id", "source", "text"))
    meta = _persist_bounded(
        "curation_meta",
        exact.select(
            "doc_id",
            "source",
            F.md5(F.lower(F.substring("text", 1, fp_len))).alias("hk"),
            F.md5(F.lower(F.expr(f"right(text, {fp_len})"))).alias("tk"),
            F.least(_tokens(), F.lit(seq_len)).alias("tok"),
        ),
    )
    keys = meta.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.array(F.col("hk"), F.col("tk")))
        ).alias("k"),
    )
    clusters = dedup_clusters_from_keys(keys)
    losers = clusters.where(
        F.col("cluster_id") != F.col("doc_id")
    ).select("doc_id")
    keepers = meta.join(losers, "doc_id", "left_anti")
    sampled = domain_mixture_sample(
        keepers.select("doc_id", "source"), weights
    ).select("doc_id")
    return sequence_packing(
        keepers.join(sampled, "doc_id").select("doc_id", "tok"),
        seq_len=seq_len,
        shards=shards,
        pretokenized=True,
    )


def q_curation_pipeline(spark, sf_dir):
    packed = curation_pipeline(
        load(spark, sf_dir, "documents", rebalance=True), MIXTURE_WEIGHTS
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum("tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.round(
                F.sum("tok") / ((F.max("bin_id") + 1) * PACK_SEQ_LEN), 4
            ).alias("utilization"),
        )
        .orderBy("shard")
    )


SQL_CURATION_PIPELINE = f"""
WITH RECURSIVE good AS (
  SELECT doc_id, source, text, md5(lower(text)) AS fp
  FROM documents
  WHERE len(string_split_regex(trim(text), '\\s+')) >= {MIN_DOC_TOKENS}
    AND length(text) >= {MIN_DOC_CHARS}
    AND CAST(len(regexp_extract_all(lower(text),
            '\\b(the|a|of|to|and|in|is|was|for)\\b')) AS DOUBLE)
        / len(string_split_regex(trim(text), '\\s+')) >= {MIN_STOP_RATIO}
), exact AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
    FROM good
  ) WHERE rk = 1
), base AS (
  SELECT doc_id,
         md5(lower(substr(text, 1, 40))) AS hk,
         md5(lower(right(text, 40))) AS tk
  FROM exact
), keys AS (
  SELECT doc_id, hk AS k FROM base
  UNION ALL
  SELECT doc_id, tk AS k FROM base
), roots AS (
  SELECT k, min(doc_id) AS root FROM keys GROUP BY k
), star AS (
  SELECT DISTINCT r.root AS src, kk.doc_id AS dst
  FROM keys kk JOIN roots r USING (k) WHERE kk.doc_id <> r.root
), cc_edges AS (
  SELECT src, dst FROM star UNION SELECT dst, src FROM star
), nodes AS (
  SELECT DISTINCT src AS doc_id FROM cc_edges
), reach(doc_id, root) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN cc_edges e ON e.src = r.doc_id
), labs AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
), keepers AS (
  SELECT e.doc_id, e.source, e.text FROM exact e
  WHERE e.doc_id NOT IN
        (SELECT doc_id FROM labs WHERE cluster_id <> doc_id)
), wts(source, w) AS (
  VALUES {_MIXTURE_VALUES}
), counts AS (
  SELECT source, count(*) AS cnt FROM keepers GROUP BY source
), per_source AS (
  SELECT w.source, w.w, coalesce(c.cnt, 0) AS cnt
  FROM wts w LEFT JOIN counts c USING (source)
), n_units AS (
  SELECT floor(min(cnt / w)) AS n FROM per_source
), quotas AS (
  SELECT source, floor(w * n) AS quota
  FROM per_source CROSS JOIN n_units
), ranked AS (
  SELECT source, doc_id, text,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM keepers
), sampled AS (
  SELECT r.doc_id, r.text
  FROM ranked r JOIN quotas q ON r.source = q.source AND r.rk <= q.quota
), toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         least(len(string_split_regex(trim(text), '\\s+')),
               {PACK_SEQ_LEN}) AS tok,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM sampled
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
       min(doc_id) AS first_doc,
       round(sum(tok) / ((max(bin_id) + 1) * {PACK_SEQ_LEN}), 4)
           AS utilization
FROM pack GROUP BY shard ORDER BY shard
"""

QUERIES = {"curation_pipeline": q_curation_pipeline}
ORACLE = {"curation_pipeline": SQL_CURATION_PIPELINE}
