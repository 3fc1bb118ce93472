"""GriTS-style metric sanity + end-to-end quality regression: the pipeline's
recovered grids score >= 0.9 F1 against the reference's gold tables."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from key_resource_table_extractor_spark.eval import grits_content
from key_resource_table_extractor_spark.extractor.pipeline import (
    extract_nested_batch,
)
from key_resource_table_extractor_spark.sources import (
    gold_table_to_spans,
    load_gold_tables,
)
from key_resource_table_extractor_spark.sources.gold_json import norm_cell

GOLD_DIR = (
    "/root/reference/data/table_content_extract/"
    "gs_bioarxiv_extracted_key_resources_tables_sampled"
)


def test_identity_scores_one():
    rows = [["a", "b"], ["c", "d"]]
    assert grits_content(rows, rows) == (1.0, 1.0, 1.0)


def test_perturbation_monotone():
    gold = [["abcd", "efgh"], ["ijkl", "mnop"]]
    close = [["abcd", "efgh"], ["ijkl", "mnXp"]]
    far = [["zzzz", "yyyy"], ["xxxx", "wwww"]]
    _, _, f_close = grits_content(close, gold)
    _, _, f_far = grits_content(far, gold)
    assert 1.0 > f_close > f_far


def test_missing_rows_lower_recall():
    gold = [["a", "b"], ["c", "d"], ["e", "f"]]
    pred = [["a", "b"], ["c", "d"]]
    p, r, _f = grits_content(pred, gold)
    assert p > r


@pytest.mark.skipif(
    not os.path.isdir(GOLD_DIR), reason="reference gold data not available"
)
def test_pipeline_scores_high_on_gold_corpus():
    gold = load_gold_tables(GOLD_DIR)
    rows = []
    for tbl in gold:
        spans = gold_table_to_spans(tbl)
        rows.append(
            (tbl["name"], [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in spans
            ])
        )
    nested = extract_nested_batch(pd.DataFrame(rows, columns=["doc_id", "spans"]))
    by_doc = dict(zip(nested["doc_id"], nested["result"]))
    f1s = []
    for tbl in gold:
        res = json.loads(by_doc[tbl["name"]])
        pred_rows = [
            r
            for page in res["result"]["pages"]
            for t in page["tables"]
            for r in t["rows"]
        ]
        gold_rows = [
            [norm_cell(c.get("content", "")) for c in row] for row in tbl["rows"]
        ]
        _p, _r, f1 = grits_content(pred_rows, gold_rows)
        f1s.append((tbl["name"], round(f1, 3)))
    avg = sum(f for _n, f in f1s) / len(f1s)
    assert avg >= 0.9, f1s
