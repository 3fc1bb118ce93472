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


QUERIES = {"media_metadata": q_media_metadata}
ORACLE = {"media_metadata": SQL_MEDIA_METADATA}
