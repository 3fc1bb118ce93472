"""Deduplication operators for a large-scale training-data pipeline.

- exact / prefix-fingerprint dedup  (hash groupBy; DuckDB-oracled)
- n-gram Jaccard near-dup pairs     (shingle self-join; DuckDB-oracled)
- MinHash + LSH banding             (Spark-only; pytest oracle with planted dups)
- SimHash hamming near-dups         (Spark-only; pytest oracle with planted dups)

Scale notes (100 TB): every variant is shuffle-on-short-key:
- exact dedup shuffles md5(fingerprint) only (map-side distinct first);
- shingle/minhash/simhash self-joins shuffle (bucket_key, doc_id) pairs,
  never document text; candidate verification joins back by doc_id;
- LSH banding bounds candidate pairs per bucket; skewed buckets (stop-shingle
  buckets) are defused by dropping buckets with > MAX_BUCKET docs, the
  standard web-dedup guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .common import load

MINHASH_PERMS = 32
MINHASH_BANDS = 8  # 4 rows per band
SIMHASH_BITS = 64
MAX_BUCKET = 50  # drop degenerate LSH buckets bigger than this
MAX_SHINGLE_DF = 50  # drop stop-shingles present in more docs than this:
# a shingle in k docs yields k^2 join rows — at web scale a boilerplate
# shingle ("all rights reserved ...") would otherwise dominate the shuffle

# one live cached band table per operator: repeated invocations in a long
# session (bench best-of-N, the query gate) would otherwise accumulate
# cached copies for the session lifetime
_live_cache: dict[str, object] = {}


def _persist_bounded(key: str, df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    prev = _live_cache.get(key)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _live_cache[key] = df
    return df


def _words(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def _word_hash_base(docs: DataFrame, n: int, extra=()):
    """(doc_id, *extra, __wh) with ``__wh`` = per-word xxhash64 array.

    The one-element ``explode`` is a Generate barrier: ``__wh`` becomes a
    plan ATTRIBUTE that every downstream shingle expression shares, where
    a plain projected alias would be re-inlined (and the word hashing
    re-run) per consumer by CollapseProject."""
    w = _words()
    wh = F.transform(w, lambda x: F.xxhash64(x))
    return docs.where(F.size(w) >= n).select(
        "doc_id", *extra, F.explode(F.array(wh)).alias("__wh")
    )


def _shingle_hashes(n: int):
    """int64 hash per word ``n``-gram, built from the ``__wh`` word-hash
    attribute: ``xxhash64(h_i, …, h_{i+n-1})`` per start position.

    Hashing each word ONCE and combining n word hashes replaces the
    per-shingle ``concat_ws`` + string ``xxhash64`` — A/B at sf0.1 the
    exploded shingle stream build dropped 2.8 s → 0.3 s (the string
    build dominated every shingle consumer). Collision contract is
    unchanged: downstream joins/df-counts are modulo 64-bit collisions,
    as with the previous string-hash form."""
    return F.transform(
        F.sequence(F.lit(1), F.size(F.col("__wh")) - n + 1),
        lambda i: F.xxhash64(
            *[F.element_at(F.col("__wh"), i + j) for j in range(n)]
        ),
    )


# --------------------------------------------------------------------------
# prefix-fingerprint dedup (exact dedup generalization; O5)
# --------------------------------------------------------------------------

def q_dedupe_prefix_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.substring("text", 1, 40)))
    return (
        docs.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_dups") > 1)
        .orderBy("fp")
    )


SQL_DEDUPE_PREFIX_FINGERPRINT = """
SELECT md5(lower(substr(text, 1, 40))) AS fp,
       count(*) AS n_dups, min(doc_id) AS keeper
FROM documents
GROUP BY fp HAVING count(*) > 1 ORDER BY fp
"""


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (shingle self-join)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, min_common: int = 2,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Near-dup pairs by shared-shingle count, hardened for scale:

    - shingles are hashed to int64 MAP-SIDE (``xxhash64``) so the self-join
      shuffle carries (hash, doc_id) pairs, never shingle text (same trick
      as ``minhash_signatures``);
    - shingles whose document frequency exceeds ``max_df`` are dropped
      before the self-join (the ``MAX_BUCKET``-style guard): a stop-shingle
      in k docs would otherwise yield k² candidate rows. Jaccard
      denominators still use each doc's FULL shingle count, so surviving
      pairs score exactly as before; pairs supported only by stop-shingles
      are not near-dups worth reporting at scale.

    The DuckDB oracle applies the identical df cap on shingle text — results
    match modulo 64-bit hash collisions (none at test scale).
    """
    base = _word_hash_base(docs, n)
    # per-doc uniqueness via IN-ROW array_distinct, not a cluster-wide
    # .distinct(): the round-2 A/B kept the distinct exchange because its
    # ReusedExchange amortized the then-expensive per-shingle string
    # hashing across consumers; with the word-hash shingle build that
    # rationale inverted (re-shingling is ~0.3 s at sf0.1) and the
    # distinct-free form re-measured 8% faster locally while removing a
    # full shuffle of the shingle stream — the better trade at 100 TB.
    sh = base.select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_hashes(n))).alias("h"),
    )
    # the (doc_id, h) table feeds three consumers (self-join a/b sides and
    # doc-frequency) and is deliberately NOT persisted: A/B-measured, the
    # cache write of the largest intermediate costs more than re-shingling
    # (map-side, codegen) — unlike the tiny band tables below. At warehouse
    # scale, write the shingle table to storage once and read it back.
    # Per-doc sizes skip the exploded table entirely: distinct-count the
    # shingle ARRAY map-side (no exchange, one row per doc — a broadcast-
    # sized Jaccard-denominator dim).
    sizes = base.select(
        "doc_id", F.size(F.array_distinct(_shingle_hashes(n))).alias("n_sh")
    )
    doc_freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    pruned = sh.join(doc_freq.where(F.col("df") <= max_df), "h").select(
        "doc_id", "h"
    )
    # pair generation via bounded per-shingle doc lists instead of a
    # second self-join pass (round 8): ``pruned`` leaves its join already
    # hash-partitioned on ``h``, so the groupBy collects WITHOUT a new
    # exchange, and each list is bounded by ``max_df`` (the cap exists
    # precisely so this is safe at any scale). The ordered i<j
    # combinations of the sorted list are exactly the a.doc_id < b.doc_id
    # join pairs — same rows, same counts — but generated map-side: the
    # b-side shuffle read and the per-partition hash-join build/probe
    # disappear from the plan (1 big-stream exchange instead of 2).
    ds = F.array_sort(F.collect_list("doc_id"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    common = (
        pruned.groupBy("h")
        .agg(ds.alias("ds"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common",
            F.round(
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents", rebalance=True))


SQL_NGRAM_JACCARD_PAIRS = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wl FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(wl[i:i+2], ' ') AS sh
  FROM w, UNNEST(range(1, len(wl) - 1)) AS t(i)
  WHERE len(wl) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), doc_freq AS (
  SELECT sh, count(*) AS df FROM sh GROUP BY sh
), kept AS (
  SELECT s.doc_id, s.sh FROM sh s JOIN doc_freq USING (sh) WHERE df <= 50
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
)
SELECT doc_a, doc_b, common,
       round(common / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# benchmark decontamination (n-gram containment vs a held-out probe set)
# --------------------------------------------------------------------------

def decontaminate_against_probes(
    docs: DataFrame, n: int = 3
) -> DataFrame:
    """Flag training documents that share any word n-gram with a held-out
    probe (benchmark) set — the standard eval-decontamination pass a
    training-data pipeline runs before a corpus ships. The probe split here
    is a deterministic md5 slice of ``doc_id`` (an engine-agnostic stand-in
    for a real benchmark table; swap the predicate for a join against one).

    Scale shape: probe n-grams are hashed to int64 MAP-SIDE and the probe
    side is tiny relative to the corpus (benchmarks are ~10^5 docs against
    10^12), so the containment join is a BROADCAST semi-join — the training
    corpus never shuffles. Returns (doc_id, n_contaminated) per flagged doc.
    """
    is_probe = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ) == "0"
    sh = _word_hash_base(docs, n, extra=(is_probe.alias("probe"),)).select(
        "doc_id",
        "probe",
        F.explode(F.array_distinct(_shingle_hashes(n))).alias("h"),
    )
    probe_sh = sh.where(F.col("probe")).select("h").distinct()
    return (
        sh.where(~F.col("probe"))
        .join(F.broadcast(probe_sh), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy("doc_id")
    )


def q_decontamination_check(spark, sf_dir):
    return decontaminate_against_probes(load(spark, sf_dir, "documents", rebalance=True))


SQL_DECONTAMINATION_CHECK = """
WITH w AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS probe,
         string_split_regex(trim(text), '\\s+') AS wl
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, probe, array_to_string(wl[i:i+2], ' ') AS sh
  FROM w, UNNEST(range(1, len(wl) - 1)) AS t(i)
  WHERE len(wl) >= 3
), probe_sh AS (
  SELECT DISTINCT sh FROM sh WHERE probe
)
SELECT doc_id, count(*) AS n_contaminated
FROM sh JOIN probe_sh USING (sh)
WHERE NOT probe
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# passage-level duplication stats (exact-substring dedup signal)
# --------------------------------------------------------------------------

def dup_passage_stats(docs: DataFrame, n: int = 5) -> DataFrame:
    """Per-document fraction of word ``n``-gram passages that also occur in
    at least one OTHER document — the passage-level signal behind
    exact-substring training-data dedup (a doc-granular reduction of the
    suffix-array approach: instead of excising shared spans, score each doc
    by how much of it is boilerplate shared with the rest of the corpus, so
    a curation pass can drop or trim the worst offenders).

    Scale shape: shingles are hashed to int64 MAP-SIDE (``xxhash64``), so
    the only wide exchanges carry (doc_id, hash) pairs. The document
    frequency comes from a ``groupBy(h)`` — which gets map-side partial
    aggregation, so a boilerplate shingle present in 10^9 docs is combined
    per-mapper instead of hot-spotting one reducer (the reason this is a
    groupBy + join-back rather than a single ``count over (partition by
    h)`` window: windows have no partial agg and would funnel every row of
    a hot shingle through one task). The join back on ``h`` reuses the
    groupBy's partitioning on one side and AQE handles residual skew.
    """
    base = _word_hash_base(docs, n)
    sh = base.select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_hashes(n))).alias("h"),
    )
    # Round-8 join-free shape: the old form joined the full (doc_id, h)
    # stream BACK onto the per-h document frequency (a second shuffle of
    # the shingle stream plus the join build/probe) only to count, per
    # doc, how many of its shingles have df > 1. Equivalent with zero
    # joins on the big stream: carry min(doc_id) through the df
    # aggregate — for a df == 1 shingle that IS its only owner — so
    # per-doc UNIQUE-shingle counts come from re-aggregating the (tiny
    # relative to the stream) df table, and n_dup = n_shingles −
    # n_unique with n_shingles computed MAP-SIDE from the in-row
    # distinct shingle array (the ngram_jaccard_pairs sizes trick).
    # Exchanges on the shingle stream: 2 → 1; the remaining joins are
    # doc-cardinality aggregates. Identical results (oracle-matched).
    sizes = base.select(
        "doc_id", F.size(F.array_distinct(_shingle_hashes(n))).alias("n_sh")
    )
    doc_freq = sh.groupBy("h").agg(
        F.count(F.lit(1)).alias("df"),
        F.min("doc_id").alias("owner"),
    )
    uniq = (
        doc_freq.where(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_uniq"))
    )
    return (
        sizes.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_sh").cast("long").alias("n_shingles"),
            (F.col("n_sh") - F.coalesce("n_uniq", F.lit(0)))
            .cast("long")
            .alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_shingles") / F.col("n_shingles"), 4),
        )
        .orderBy("doc_id")
    )


def q_dup_passage_stats(spark, sf_dir):
    return dup_passage_stats(load(spark, sf_dir, "documents", rebalance=True))


SQL_DUP_PASSAGE_STATS = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wl FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(wl[i:i+4], ' ') AS sh
  FROM w, UNNEST(range(1, len(wl) - 3)) AS t(i)
  WHERE len(wl) >= 5
), doc_freq AS (
  SELECT sh, count(*) AS df FROM sh GROUP BY sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_shingles,
       round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) / count(*), 4)
           AS dup_fraction
FROM sh JOIN doc_freq USING (sh)
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# dedup clusters: connected components over fingerprint-collision edges
# --------------------------------------------------------------------------

CC_MAX_ITERS = 25


def dedup_clusters(
    docs: DataFrame, fp_len: int = 40, max_iters: int = CC_MAX_ITERS
) -> DataFrame:
    """Group near-duplicate documents into clusters via connected components
    and elect a canonical keeper per cluster (min doc_id) — the
    canonicalization step every LSH-style dedup needs: band collisions give
    PAIRS, but "keep one copy" requires the transitive closure (A~B on one
    key, B~C on another must keep one of {A,B,C}, not two).

    Edges are star edges per fingerprint key (every doc links to the
    key-group's min doc): same components as the full clique, but O(group)
    edges instead of O(group²) — the guard that makes a 10^7-member
    boilerplate cluster representable at all. Two independent keys (head
    and tail fingerprint — stand-ins for any LSH band keys) make components
    genuinely transitive rather than per-key cliques.

    Labels iterate min-label propagation restricted to docs incident to at
    least one edge (singletons never change and are not reported). Each
    round MUST truncate lineage (eager ``localCheckpoint`` → leaf plan):
    labels_{i+1} references labels_i twice (the self value and the
    propagated min), so without truncation the logical plan DOUBLES per
    round — 2^iters nodes, found the hard way as a driver OOM on a
    deep-chain fuzz graph. The previous generation's checkpoint blocks
    are released explicitly each round (``rdd.unpersist``), so storage
    holds one generation. Convergence is an exact per-round COUNT of
    changed labels (``sum(new != old)``, one scalar to the driver, no
    data) — zero means fixpoint. A label SUM would be cheaper to carry
    but can overflow int64 on large doc_ids at 10^12 docs, where Spark's
    non-ANSI sum wraps silently; a count of changes is bounded by the
    row count and cannot wrap. Star-edge graphs converge in O(chain
    length across keys) rounds; ``max_iters`` bounds pathological
    inputs, and exhausting it without reaching the fixpoint RAISES
    (partial labels are wrong answers, not approximations).

    Returns (doc_id, cluster_id, cluster_size) for docs in clusters of
    size > 1 — matched exactly by a recursive-CTE DuckDB oracle. The
    returned DataFrame is backed by the final generation's checkpoint
    blocks and is valid until the NEXT ``dedup_clusters`` invocation
    (which releases them) — consume it before calling again.
    """
    head = F.md5(F.lower(F.substring("text", 1, fp_len)))
    tail = F.md5(F.lower(F.expr(f"right(text, {fp_len})")))
    # in-row array_distinct: a unique doc whose head fingerprint equals
    # its tail (any text <= fp_len chars) must contribute ONE row to that
    # key, not two — otherwise the group-size filter below would admit it
    # as a spurious singleton "cluster". Deduping the (at most two) keys
    # per doc map-side keeps the group count a cheap count(1) (each doc
    # contributes a key at most once ⇒ row count == distinct-doc count).
    keys = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.array(head, tail))).alias("k"),
    )
    return dedup_clusters_from_keys(keys, max_iters=max_iters)


def dedup_clusters_from_keys(
    keys: DataFrame, max_iters: int = CC_MAX_ITERS
) -> DataFrame:
    """``dedup_clusters`` core over a prebuilt ``(doc_id, k)`` key table
    (each doc's keys already in-row-distinct). Split out in round 8 so
    ``curation_pipeline`` can feed it fingerprints from its narrow
    persisted meta table instead of re-running the text scan + quality
    gate per consumer; same algorithm, same contract."""
    # group size rides along so incident docs (>= 2 docs on some key) and
    # their min-root INITIAL labels come from the same join — identity
    # init would spend the whole first propagation round discovering
    # exactly this value
    roots = (
        keys.groupBy("k")
        .agg(
            F.min("doc_id").alias("root"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") >= 2)
        .select("k", "root")
    )
    member = keys.join(roots, "k")
    star = (
        member.where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    # persist the iteration-invariant edge table PRE-PARTITIONED on the
    # per-round join key (round 8): every propagation round joins edges
    # on ``src``, and an un-keyed persist re-shuffled the edge side once
    # per round — hash-partitioning it before the persist drops one
    # exchange from every round (A/B at sf1: 3.1-3.5s → 2.1-2.3s,
    # labels byte-identical). The classic bucket-the-static-side trade;
    # at warehouse scale this is the same persisted width, just keyed.
    edges = _persist_bounded(
        "cc_edges",
        star.unionByName(
            star.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition(F.col("src")),
    )
    # localCheckpoint's persisted blocks belong to an INTERNAL RDD —
    # ``df.rdd.unpersist()`` frees only a derived Python-conversion RDD
    # (verified empirically: blocks survive). Track the real ids by
    # diffing the context's persistent-RDD registry around each
    # checkpoint and unpersist by id. Single-driver operation; the diff
    # window contains only this op's checkpoint.
    sc = keys.sparkSession.sparkContext

    def _persisted_ids() -> set:
        # ONE py4j round trip (keySet -> jvm array) instead of iterating
        # the scala map entry-by-entry over the gateway: the registry is
        # scanned twice per checkpoint round, and the per-element
        # iterator cost grew with every persisted RDD in the session
        # (round-8 profiling: the iterator form charged the label-
        # propagation loop hundreds of ms per round in long sessions)
        jmap = sc._jsc.getPersistentRDDs()
        return {int(rid) for rid in jmap.keySet().toArray()}

    def _checkpoint_tracked(df):
        before = _persisted_ids()
        out = df.localCheckpoint(eager=True)
        return out, _persisted_ids() - before

    def _release_ids(ids) -> None:
        jmap = sc._jsc.sc().getPersistentRDDs()
        for rid in ids:
            try:
                if jmap.contains(rid):
                    jmap.apply(rid).unpersist(False)
            except Exception:
                pass

    # free the FINAL generation of the previous invocation (its returned
    # DataFrame is documented valid only until the next call)
    _release_ids(_live_cache.pop("cc_labels_ckpt_ids", set()))

    labels, live_ids = _checkpoint_tracked(
        member.groupBy("doc_id")
        .agg(F.min("root").alias("mr"))
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.col("mr")).alias("label"),
        )
    )
    if labels.isEmpty():
        # no duplicate edges at this scale: empty, correctly-typed result.
        # Still hand the (empty) checkpoint's blocks to the release slot —
        # dropping live_ids here would leak one persisted RDD registration
        # per no-edge invocation for the session lifetime.
        _live_cache["cc_labels_ckpt_ids"] = live_ids
        return labels.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    converged = False
    for _ in range(max_iters):
        cand = (
            edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("dst", "doc_id")
        )
        prev_ids = live_ids
        # carry a changed flag through the checkpoint so convergence is an
        # exact count (overflow-free), then drop it from the working set
        gen, live_ids = _checkpoint_tracked(
            labels.join(cand, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nl", F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"), F.coalesce("nl", F.col("label"))
                    )
                    != F.col("label")
                )
                .cast("long")
                .alias("__chg"),
            )
        )
        labels = gen.select("doc_id", "label")
        # new generation is materialized; release the previous one's blocks
        _release_ids(prev_ids)
        if gen.agg(F.sum("__chg")).first()[0] == 0:
            converged = True
            break
    if not converged:
        _release_ids(live_ids)
        raise RuntimeError(
            f"dedup_clusters: min-label propagation did not converge in "
            f"max_iters={max_iters} rounds; the partial labels would be "
            f"wrong cluster assignments. Raise max_iters (a chain of k "
            f"fingerprint keys needs O(k) rounds)."
        )
    # the final generation backs the returned DataFrame; it is released at
    # the START of the next invocation (bench best-of-N, the query gate)
    # instead of leaking one label table per call
    _live_cache["cc_labels_ckpt_ids"] = live_ids
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


def q_dedup_clusters(spark, sf_dir):
    # no rebalance: the op is iteration/persist-bound (serial label-
    # propagation rounds over tiny frames), and the md5 key build is
    # light map work — A/B at sf1 the extra exchange only added cost
    return dedup_clusters(load(spark, sf_dir, "documents"))


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE base AS (
  SELECT doc_id,
         md5(lower(substr(text, 1, 40))) AS hk,
         md5(lower(right(text, 40))) AS tk
  FROM documents
), keys AS (
  SELECT doc_id, hk AS k FROM base
  UNION ALL
  SELECT doc_id, tk AS k FROM base
), roots AS (
  SELECT k, min(doc_id) AS root FROM keys GROUP BY k
), star AS (
  SELECT DISTINCT r.root AS src, kk.doc_id AS dst
  FROM keys kk JOIN roots r USING (k) WHERE kk.doc_id <> r.root
), edges AS (
  SELECT src, dst FROM star UNION SELECT dst, src FROM star
), nodes AS (
  SELECT DISTINCT src AS doc_id FROM edges
), reach(doc_id, root) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.doc_id
), labs AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
), sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM labs GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM labs l JOIN sizes s USING (cluster_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# MinHash + LSH banding (Spark-only; hash functions engine-specific)
# --------------------------------------------------------------------------

# fixed universal-hash permutation constants (odd multipliers) and shingle
# mixing constants — seeded once, identical on every executor/partition
_MH_RNG = __import__("numpy").random.RandomState(1234)
_MH_A = (
    _MH_RNG.randint(1, 1 << 62, MINHASH_PERMS, dtype="int64") * 2 + 1
)
_MH_B = _MH_RNG.randint(1, 1 << 62, MINHASH_PERMS, dtype="int64")


def _s64(x: int):
    import numpy as np

    return np.int64(np.uint64(x).astype(np.int64))


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """One row per doc with MINHASH_PERMS min-hash columns — fully MAP-SIDE.

    The signature is a per-row function of the shingle set, computed in
    two vectorized halves: the JVM hashes each WORD once (``xxhash64``
    inside whole-stage codegen — one hash per word, no per-shingle string
    concatenation), then an Arrow batch stage mixes ``n`` consecutive
    word hashes into shingle hashes and takes all MINHASH_PERMS
    universal-hash permutation minima with numpy ``minimum.reduceat``.
    Zero exchanges — at 100 TB the word stream never leaves the mapper.

    History: round 3's all-expression form (per-shingle ``concat_ws`` +
    ``xxhash64``, then 32 interpreted array-HOF traversals) measured
    3.9 s for the signature stage at sf0.1/local[32]; this form measures
    0.49 s (8×) producing equally-valid signatures (different hash
    family — permutation minima over universal hashes of mixed word
    hashes). ``array_distinct`` was dropped outright: a min over a
    multiset equals the min over its set.
    """
    import numpy as np
    import pyarrow as pa

    w = _words()
    wh = F.transform(w, lambda x: F.xxhash64(x))
    base = docs.where(F.size(w) >= n).select("doc_id", wh.alias("wh"))
    names = ["doc_id"] + [f"mh{i}" for i in range(MINHASH_PERMS)]
    mix_c = [_s64(v) for v in (
        0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
    )]
    if n > len(mix_c):
        raise ValueError(f"shingle width n={n} > {len(mix_c)} unsupported")

    def fn(batches):
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            # pass doc_id through as the arrow array it came in as — the
            # operator must not narrow a string/other id type to bigint
            did = tbl.column("doc_id").combine_chunks()
            col = tbl.column("wh").combine_chunks()
            vals = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            # a sliced/offset ListArray keeps the full child in .values
            # with offsets that need not start at 0 — re-window so the
            # reduceat segment math below stays valid for any arrow layout
            vals = vals[offs[0]:offs[-1]]
            offs = offs - offs[0]
            assert len(vals) == offs[-1], "arrow list window mismatch"
            lens = np.diff(offs)
            scnt = lens - (n - 1)  # shingles per doc (>=1: filtered)
            tail = n - 1
            with np.errstate(over="ignore"):
                body = len(vals) - tail
                mix = np.zeros(max(body, 0), dtype=np.int64)
                for j in range(n):
                    mix += mix_c[j] * vals[j:body + j]
                mix ^= mix >> np.int64(29)
                # keep only shingle starts whose window stays in-doc
                idx = np.arange(max(body, 0))
                seg_end = np.repeat(offs[1:], lens)[:max(body, 0)]
                sh = mix[idx + tail < seg_end]
                starts = np.zeros(len(did), dtype=np.int64)
                np.cumsum(scnt[:-1], out=starts[1:])
                arrs = {"doc_id": did}
                for i in range(MINHASH_PERMS):
                    if len(sh):
                        pv = _MH_A[i] * sh + _MH_B[i]
                        arrs[f"mh{i}"] = np.minimum.reduceat(pv, starts)
                    else:
                        arrs[f"mh{i}"] = np.empty(0, np.int64)
            yield pa.RecordBatch.from_pydict(
                {k: arrs[k] for k in names}
            )

    id_type = docs.schema["doc_id"].dataType.simpleString()
    ddl = f"doc_id {id_type}, " + ", ".join(
        f"mh{i} bigint" for i in range(MINHASH_PERMS)
    )
    return base.mapInArrow(fn, ddl)


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, max_bucket: int | None = MAX_BUCKET
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over minhash signatures.

    ``max_bucket`` drops degenerate band buckets bigger than this before the
    self-join (``None`` disables — small/skewed corpora where every bucket is
    hot would otherwise silently lose true pairs)."""
    sig = minhash_signatures(docs, n)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(bnd),
                *[
                    F.col(f"mh{bnd * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
            for bnd in range(MINHASH_BANDS)
        ]
    )
    exploded = sig.select("doc_id", F.posexplode(bands).alias("band", "bval"))
    # three consumers (bucket sizes + both self-join sides) — materialize
    # the tiny band table (MINHASH_BANDS rows/doc) once instead of running
    # the 32-aggregate signature pipeline three times (A/B-measured win;
    # exchange reuse does not cover the three consumers)
    exploded = _persist_bounded("minhash_bands", exploded)
    # defuse skewed buckets before the self-join
    pruned = exploded
    if max_bucket is not None:
        bucket_sizes = exploded.groupBy("band", "bval").agg(
            F.count(F.lit(1)).alias("bn")
        )
        pruned = exploded.join(
            bucket_sizes.where(F.col("bn") <= max_bucket), ["band", "bval"]
        )
    # NOTE (round 8): the ngram-style collect_list pair generation was
    # tried here and measured SLOWER (2.4s vs 1.5s at sf1): unlike the
    # shingle stream, the band table is PERSISTED, so the self-join's
    # b-side is a cheap cache read into a codegen'd hash join, while the
    # combination build is interpreted HOFs. The join form stays.
    a = pruned.alias("a")
    b = pruned.alias("b")
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .orderBy("doc_a", "doc_b")
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    # bounded output for the driver: band-agreement histogram of candidates
    pairs = minhash_lsh_pairs(load(spark, sf_dir, "documents"))
    return (
        pairs.groupBy("n_bands")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("n_bands")
    )


# --------------------------------------------------------------------------
# SimHash near-dups (Spark-only)
# --------------------------------------------------------------------------

def simhash_df(docs: DataFrame) -> DataFrame:
    """64-bit simhash per doc from distinct word hashes — fully MAP-SIDE.

    The signature is a per-row function of the token set: per bit, the
    majority vote of distinct token hashes (+1 if bit set else -1 —
    equivalently ``2·ones > n``). No exchange at all: the JVM hashes each
    word once (``xxhash64`` in whole-stage codegen) and an Arrow batch
    stage takes the 64 per-bit majority votes with numpy ``reduceat``
    over the flattened hash stream. History: the round-4 all-expression
    vote (``transform(sequence(0,63), b -> size(filter(__hs, ...)))``)
    interpreted ~64·|hs| Catalyst lambdas per row and measured 4.9 s at
    sf1/local[32]; this form measures ~0.7 s with byte-identical
    signatures (round-8 A/B, pinned by
    tests/test_dedup.py::test_simhash_arrow_vote_matches_expression).
    """
    import numpy as np
    import pyarrow as pa

    hs = F.array_distinct(F.transform(_words(), lambda w: F.xxhash64(w)))
    base = docs.select("doc_id", hs.alias("__hs"))
    id_type = docs.schema["doc_id"].dataType.simpleString()

    def fn(batches):
        for rb in batches:
            tbl = pa.table(rb)
            did = tbl.column("doc_id").combine_chunks()
            col = tbl.column("__hs").combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            # re-window a sliced ListArray (same caveat as
            # minhash_signatures: .values keeps the full child)
            vals = vals[offs[0]:offs[-1]]
            offs = offs - offs[0]
            lens = np.diff(offs)
            n = len(lens)
            sim = np.zeros(n, dtype=np.uint64)
            if len(vals):
                starts = np.minimum(offs[:-1], len(vals) - 1)
                nonempty = lens > 0
                for b in range(SIMHASH_BITS):
                    ones = np.add.reduceat((vals >> b) & 1, starts)
                    maj = nonempty & (2 * ones > lens)
                    sim |= maj.astype(np.uint64) << np.uint64(b)
            # a null __hs (null text) emits simhash 0, matching the
            # expression form (CASE over a null majority test is false
            # for every bit, so the fold returns the 0 seed, not null)
            yield pa.RecordBatch.from_arrays(
                [did, pa.array(sim.view(np.int64), type=pa.int64())],
                names=["doc_id", "simhash"],
            )

    return base.mapInArrow(fn, f"doc_id {id_type}, simhash bigint")


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Pairs within hamming distance via 4×16-bit band blocking.

    Pigeonhole: hamming <= 3 over 64 bits → at least one 16-bit band equal.

    ``max_bucket`` drops band buckets bigger than this before the self-join
    (``None`` disables): a corpus whose all 4 bands are hot would otherwise
    silently lose true near-dup pairs — same tuning surface as
    ``ngram_jaccard_pairs(max_df=...)`` and ``minhash_lsh_pairs``.
    """
    sim = simhash_df(docs)
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("int")
            for i in range(4)
        ]
    )
    ex = sim.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band", "bval")
    )
    # three consumers (band sizes + both self-join sides) — materialize the
    # tiny band table (4 rows/doc) once instead of recomputing the
    # 64-bit-vote aggregation three times (A/B-measured win)
    ex = _persist_bounded("simhash_bands", ex)
    # defuse skewed band buckets before the self-join (same guard as the
    # minhash path): templated/short docs collapse to few simhash values,
    # and one hot 16-bit band value would otherwise go quadratic
    if max_bucket is not None:
        band_sizes = ex.groupBy("band", "bval").agg(
            F.count(F.lit(1)).alias("bn")
        )
        ex = ex.join(
            band_sizes.where(F.col("bn") <= max_bucket), ["band", "bval"]
        )
    # NOTE (round 8): the ngram-style collect_list pair generation was
    # tried here and measured SLOWER (1.7s vs 0.6s at sf1) — same
    # reason as minhash_lsh_pairs: the persisted band table makes the
    # self-join a cache read into codegen. The join form stays.
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def q_simhash_near_dups(spark, sf_dir):
    # bounded output for the driver: hamming-distance histogram of near-dups
    pairs = simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=6)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


# --------------------------------------------------------------------------
# boilerplate removal — drop sentences whose normalized form recurs across
# more than ``df_cap`` documents (the CCNet/Dolma line-dedup step: nav
# chrome, cookie banners, licence footers), then reassemble each document
# from its surviving sentences.
# --------------------------------------------------------------------------

BOILERPLATE_DF_CAP = 3


def remove_boilerplate(docs: DataFrame, df_cap: int = BOILERPLATE_DF_CAP):
    """(doc_id, pos, sent) of surviving sentences per document.

    Scale shape: sentence split + fingerprint are MAP-SIDE (posexplode is
    a Generate, no shuffle); the document-frequency aggregate moves only
    (md5, doc_id) short keys with partial aggregation; the hot set —
    sentences in more than ``df_cap`` docs — is tiny relative to the
    corpus (boilerplate is by definition few distinct strings), so the
    removal join is a BROADCAST anti join: the sentence stream itself
    never shuffles for it. Reassembly (in the caller) is the one big
    shuffle, and it carries only surviving sentences.
    """
    sents = docs.select(
        "doc_id",
        F.posexplode(F.split("text", r"\.\s+")).alias("pos", "sent"),
    ).withColumn("fp", F.md5(F.lower(F.trim(F.col("sent")))))
    hot = (
        sents.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") > df_cap)
        .select("fp")
    )
    return sents.join(F.broadcast(hot), "fp", "left_anti").select(
        "doc_id", "pos", "sent"
    )


def q_boilerplate_removal(spark, sf_dir):
    """Per-doc evidence row: surviving-sentence count, removed count, and
    an md5 checksum of the reassembled text (fixed '. ' separator — the
    split consumed the original separators, so reassembly is normalized
    identically in both engines)."""
    docs = load(spark, sf_dir, "documents")
    kept = remove_boilerplate(docs)
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                lambda s: s["sent"],
            ),
            ". ",
        ).alias("new_text"),
    )
    totals = docs.select(
        "doc_id",
        F.size(F.split("text", r"\.\s+")).alias("n_sents"),
    )
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_sents") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.length(F.coalesce("new_text", F.lit("")))
            .cast("long")
            .alias("new_len"),
            F.md5(F.coalesce("new_text", F.lit(""))).alias("new_md5"),
        )
        .orderBy("doc_id")
    )


SQL_BOILERPLATE_REMOVAL = f"""
WITH s AS (
  SELECT doc_id, i - 1 AS pos, sl[i] AS sent,
         md5(lower(trim(sl[i]))) AS fp
  FROM (
    SELECT doc_id, string_split_regex(text, '\\.\\s+') AS sl
    FROM documents
  ), UNNEST(range(1, len(sl) + 1)) AS t(i)
), hot AS (
  SELECT fp FROM (
    SELECT fp, count(DISTINCT doc_id) AS df FROM s GROUP BY fp
  ) WHERE df > {BOILERPLATE_DF_CAP}
), kept AS (
  SELECT doc_id, pos, sent FROM s
  WHERE fp NOT IN (SELECT fp FROM hot)
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         array_to_string(list(sent ORDER BY pos), '. ') AS new_text
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents FROM s GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.n_kept, 0) AS n_kept,
       t.n_sents - coalesce(a.n_kept, 0) AS n_removed,
       CAST(length(coalesce(a.new_text, '')) AS BIGINT) AS new_len,
       md5(coalesce(a.new_text, '')) AS new_md5
FROM tot t LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


QUERIES = {
    "dedupe_prefix_fingerprint": q_dedupe_prefix_fingerprint,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "decontamination_check": q_decontamination_check,
    "dup_passage_stats": q_dup_passage_stats,
    "dedup_clusters": q_dedup_clusters,
    "boilerplate_removal": q_boilerplate_removal,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_near_dups": q_simhash_near_dups,
}

ORACLE = {
    "dedupe_prefix_fingerprint": SQL_DEDUPE_PREFIX_FINGERPRINT,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "decontamination_check": SQL_DECONTAMINATION_CHECK,
    "dup_passage_stats": SQL_DUP_PASSAGE_STATS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "boilerplate_removal": SQL_BOILERPLATE_REMOVAL,
    # minhash_lsh_pairs / simhash_near_dups: engine-specific hash functions —
    # rows-only driver check; semantic oracle lives in tests/test_dedup.py
}
