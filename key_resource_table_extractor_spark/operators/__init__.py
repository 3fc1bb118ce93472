"""SQL-expressible operators over the driver's TPC-H-ish tables.

Each submodule exposes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL). ``__spark_entry__.py`` merges them. The
operator set covers SURVEY.md §2 (joins, aggregations, windows, sorts/set
ops, scalar functions) plus the training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from __future__ import annotations

from . import (  # noqa: F401
    curation,
    dedup,
    labels,
    multimodal,
    relational,
    similarity,
    text,
)

ALL_MODULES = [relational, text, dedup, similarity, multimodal, curation,
               labels]


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracle_sql():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE)
    return out
