"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with struct metadata. The real
decode libs aren't in this container, so `decode_image_stub` raises
NotImplementedError and the query path uses `fake_decode_meta` — a
deterministic arithmetic stand-in — while the Spark-side plumbing (binary
schema, Arrow batch shape, mapInPandas signature, partitioning) is real and
DuckDB-oracled via the same arithmetic.

Scale notes: payloads never enter a shuffle — metadata is derived in a
map-only stage; Arrow batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so heavy media
rows can't blow executor memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .common import load

MEDIA_META_DDL = (
    "doc_id bigint, n_bytes int, width int, height int, n_frames int"
)


def decode_image_stub(payload: bytes):
    """Placeholder for a real image decoder (PIL/libjpeg not shipped)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic metadata from payload bytes (vectorized, no per-row)."""
    n_bytes = pdf["payload"].str.len().astype("int32")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "width": (64 + n_bytes % 512).astype("int32"),
            "height": (64 + (n_bytes * 7) % 512).astype("int32"),
            "n_frames": (1 + n_bytes % 8).astype("int32"),
        }
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    """documents → binary payload → mapInPandas metadata extraction."""
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def fn(batches):
        for pdf in batches:
            yield fake_decode_meta(pdf)

    return payload.mapInPandas(fn, MEDIA_META_DDL)


def q_media_metadata(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return media_metadata(docs).orderBy("doc_id")


SQL_MEDIA_METADATA = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT)                 AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 512 AS INT)      AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 8 AS INT)         AS n_frames
FROM documents ORDER BY doc_id
"""


FRAME_SAMPLE_DDL = (
    "doc_id bigint, frame_idx int, frame_off int, frame_len int"
)

MAX_SAMPLED_FRAMES = 4


def frame_sample(docs: DataFrame) -> DataFrame:
    """Video-style frame sampling plumbing: one output row per sampled
    frame, map-only (payloads never shuffle), deterministic uniform stride.

    The decode step is stubbed (`decode_image_stub`); what is real — and
    what matters at 100 TB — is the Spark-side shape: a binary payload
    column fans out to per-frame rows inside `mapInPandas` with bounded
    Arrow batches, and each frame row carries (offset, length) into the
    payload instead of a copied slice, so the fan-out adds O(rows) bytes,
    not O(payload).
    """
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def fn(batches):
        for pdf in batches:
            meta = fake_decode_meta(pdf)
            n = meta["n_frames"].to_numpy()
            nb = meta["n_bytes"].to_numpy()
            import numpy as np

            k = np.minimum(n, MAX_SAMPLED_FRAMES)
            reps = k.astype(np.int64)
            doc = np.repeat(meta["doc_id"].to_numpy(), reps)
            # uniform stride: frame j of k samples frame floor(j*n/k)
            j = np.concatenate([np.arange(x) for x in reps]) if len(reps) else np.zeros(0, dtype=np.int64)
            n_rep = np.repeat(n, reps)
            nb_rep = np.repeat(nb, reps)
            idx = (j * n_rep) // np.maximum(np.repeat(k, reps), 1)
            flen = nb_rep // np.maximum(n_rep, 1)
            yield pd.DataFrame(
                {
                    "doc_id": doc,
                    "frame_idx": idx.astype("int32"),
                    "frame_off": (idx * flen).astype("int32"),
                    "frame_len": flen.astype("int32"),
                }
            )

    return payload.mapInPandas(fn, FRAME_SAMPLE_DDL)


def q_media_frame_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return frame_sample(docs).orderBy("doc_id", "frame_idx")


SQL_MEDIA_FRAME_SAMPLE = """
WITH meta AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT)            AS n_bytes,
         CAST(1 + octet_length(encode(text)) % 8 AS INT)    AS n_frames
  FROM documents
), k AS (
  SELECT doc_id, n_bytes, n_frames,
         LEAST(n_frames, 4) AS n_samp
  FROM meta
)
SELECT doc_id,
       CAST((j * n_frames) // n_samp AS INT)                      AS frame_idx,
       CAST(((j * n_frames) // n_samp) * (n_bytes // n_frames) AS INT)
                                                                  AS frame_off,
       CAST(n_bytes // n_frames AS INT)                           AS frame_len
FROM k, UNNEST(range(0, n_samp)) AS t(j)
ORDER BY doc_id, frame_idx
"""


# --------------------------------------------------------------------------
# resize plumbing — payload → transformed payload (binary in, binary out)
# --------------------------------------------------------------------------

RESIZE_DDL = "doc_id bigint, out_w int, out_h int, payload binary"

RESIZE_TARGET_W = 32
RESIZE_TARGET_H = 32


def resize_media(docs: DataFrame) -> DataFrame:
    """Resize plumbing: binary payload in, TRANSFORMED binary payload out —
    the shape every decode→resize→re-encode stage has. The pixel resample
    is stubbed (no imaging libs; `decode_image_stub`) with a deterministic
    byte-level reduction: the "resized" payload is the prefix proportional
    to the target/source area ratio (min 1 byte). What is real: a
    binary→binary `mapInPandas` stage (Arrow binary columns both ways,
    bounded batches, map-only — payloads still never shuffle), with the
    output payload byte-exactly checkable (the gate compares md5 of the
    produced binary against DuckDB computing the same slice).
    """
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def fn(batches):
        import numpy as np

        for pdf in batches:
            meta = fake_decode_meta(pdf)
            # int64: n_bytes is int32 and nb*1024 would wrap negative for
            # payloads over ~2 MiB (routine for media), silently emitting
            # a 1-byte output while the BIGINT oracle computes correctly
            src_area = (meta["width"] * meta["height"]).to_numpy(np.int64)
            nb = meta["n_bytes"].to_numpy(np.int64)
            # min 1 byte — except an EMPTY payload stays empty (the
            # oracle mirrors via least(out_n, nb))
            out_n = np.minimum(
                np.maximum(
                    (nb * RESIZE_TARGET_W * RESIZE_TARGET_H) // src_area, 1
                ),
                nb,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": np.full(len(pdf), RESIZE_TARGET_W, dtype="int32"),
                    "out_h": np.full(len(pdf), RESIZE_TARGET_H, dtype="int32"),
                    "payload": [
                        p[: int(n)] for p, n in zip(pdf["payload"], out_n)
                    ],
                }
            )

    return payload.mapInPandas(fn, RESIZE_DDL)


def q_media_resize(spark, sf_dir):
    out = resize_media(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "out_w",
        "out_h",
        F.length("payload").cast("int").alias("out_bytes"),
        # md5 over the HEX of the byte prefix, not md5(binary): DuckDB has
        # no BLOB slice or md5(BLOB), but hex is byte-faithful (2 chars per
        # byte, uppercase in both engines), so the digest stays BYTE-exact
        # on multi-byte text — a char-based substr oracle would diverge the
        # moment a prefix splits a UTF-8 sequence (tests/test_nonascii_gate)
        F.md5(F.hex("payload")).alias("payload_md5"),
    ).orderBy("doc_id")


SQL_MEDIA_RESIZE = f"""
WITH meta AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS nb,
         CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS w,
         CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS h
  FROM documents
), sized AS (
  SELECT doc_id, text, nb,
         least(greatest((nb * {RESIZE_TARGET_W} * {RESIZE_TARGET_H})
                        // (w * h), 1), nb) AS out_n
  FROM meta
)
SELECT doc_id,
       CAST({RESIZE_TARGET_W} AS INT) AS out_w,
       CAST({RESIZE_TARGET_H} AS INT) AS out_h,
       CAST(out_n AS INT) AS out_bytes,
       md5(substring(hex(encode(text)), 1, CAST(2 * out_n AS BIGINT)))
         AS payload_md5
FROM sized ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# feature-extract plumbing — payload → fixed-dim float vector
# --------------------------------------------------------------------------

MEDIA_FEATURE_DIM = 16
MEDIA_EMBED_DDL = "doc_id bigint, feature array<float>"


def embed_media(docs: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: binary payload → fixed-dim float
    vector, the schema/batch shape of any image/audio embedding stage.
    The model forward pass is stubbed (deterministic arithmetic on the
    payload length — `decode_image_stub` documents the real hook); the
    real part is the binary→array<float> `mapInPandas` signature whose
    output feeds the similarity/ANN operators unchanged.
    """
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def fn(batches):
        import numpy as np

        for pdf in batches:
            nb = pdf["payload"].str.len().to_numpy(dtype=np.int64)
            i = np.arange(1, MEDIA_FEATURE_DIM + 1, dtype=np.int64)
            feats = ((nb[:, None] * i[None, :]) % 97) / 97.0
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [row.astype("float32") for row in feats],
                }
            )

    return payload.mapInPandas(fn, MEDIA_EMBED_DDL)


def q_media_embed(spark, sf_dir):
    # bounded, hash-stable driver output: per-doc feature checksum stats
    out = embed_media(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("feature_sum"),
        F.round(F.array_max("feature").cast("double"), 4).alias(
            "feature_max"
        ),
    ).orderBy("doc_id")


SQL_MEDIA_EMBED = f"""
WITH nb AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
), feats AS (
  SELECT doc_id,
         CAST(((n * i) % 97) AS DOUBLE) / 97.0 AS v
  FROM nb, UNNEST(range(1, {MEDIA_FEATURE_DIM} + 1)) AS t(i)
)
SELECT doc_id,
       round(sum(CAST(CAST(v AS FLOAT) AS DOUBLE)), 4) AS feature_sum,
       round(max(CAST(CAST(v AS FLOAT) AS DOUBLE)), 4) AS feature_max
FROM feats GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_frame_sample": q_media_frame_sample,
    "media_resize": q_media_resize,
    "media_embed": q_media_embed,
}
ORACLE = {
    "media_metadata": SQL_MEDIA_METADATA,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "media_resize": SQL_MEDIA_RESIZE,
    "media_embed": SQL_MEDIA_EMBED,
}
