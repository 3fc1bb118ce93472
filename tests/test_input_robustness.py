"""Malformed-input robustness: null spans arrays, null fields, empty
batches — the batch must not fail and well-formed docs must be unaffected."""

from __future__ import annotations

import pandas as pd

from key_resource_table_extractor_spark.extractor.pipeline import (
    extract_pandas_batch,
)

GOOD = [
    {"kind": "text", "text": "Key Resources Table", "media_ref": "", "offset": 0},
    {"kind": "text", "text": "REAGENT or RESOURCE   SOURCE   IDENTIFIER",
     "media_ref": "", "offset": 1},
    {"kind": "text", "text": "Anti-Foo              Abcam    RRID:AB_1",
     "media_ref": "", "offset": 2},
]


def test_null_spans_and_fields_do_not_poison_batch():
    pdf = pd.DataFrame(
        {
            "doc_id": ["good", "null_spans", "null_fields", "empty"],
            "spans": [
                GOOD,
                None,
                [
                    {"kind": None, "text": None, "media_ref": None, "offset": None},
                    {"kind": "media", "text": None, "media_ref": None, "offset": 1},
                ],
                [],
            ],
        }
    )
    out = extract_pandas_batch(pdf)
    good = out[(out.doc_id == "good") & (out.kind == "text")]
    assert len(good) > 0
    assert (out["kind"] != "error").all()  # nothing crashed per-doc either
    # stats row counts all four docs
    import json

    stats = json.loads(out[out.kind == "stats"].iloc[0]["text"])
    assert stats["n_docs"] == 4
    assert stats["n_errors"] == 0


def test_empty_batch():
    out = extract_pandas_batch(pd.DataFrame({"doc_id": [], "spans": []}))
    assert list(out.columns) == [
        "doc_id", "seq", "kind", "text", "media_ref", "offset",
    ]
    assert len(out) == 0
