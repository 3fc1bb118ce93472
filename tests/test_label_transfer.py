"""Positional label transfer vs an independent pure-Python twin of the
reference tool's semantics (scripts/label_transfer.py:12-33):
``instances[i].label = labeled[i + offset].label`` per file."""

from __future__ import annotations

import random

from key_resource_table_extractor_spark.operators.labels import (
    pair_annotated_files,
    transfer_labels,
)


def _python_transfer(labeled_rows, instance_rows, offset=1):
    """Reference-semantics twin on plain tuples (file, seq, label, ...)."""
    by_file_lab = {}
    for f, s, lab in sorted(labeled_rows):
        by_file_lab.setdefault(f, []).append(lab)
    out = {}
    for f, s, payload in sorted(instance_rows):
        pos = len([x for x in out if x[0] == f])
        labs = by_file_lab.get(f, [])
        idx = pos + offset
        out[(f, s)] = labs[idx] if 0 <= idx < len(labs) else None
    return out


def test_transfer_matches_python_twin(spark):
    rng = random.Random(5)
    labeled, instances = [], []
    for fi in range(6):
        f = f"doc_{fi}_annot.json"
        n = rng.randint(2, 8)
        for s in range(n):
            labeled.append((f"doc_{fi}.json", s * 10, f"L{fi}_{s}"))
        for s in range(n - 1):  # instances list is one shorter (offset 1)
            instances.append((f"doc_{fi}.json", s * 7, f"payload{fi}_{s}"))
    from pyspark.sql import functions as F

    lab_df = spark.createDataFrame(labeled, "file string, seq int, label string")
    ins_df = spark.createDataFrame(
        instances, "file string, seq int, payload string"
    ).withColumn("label", F.lit(None).cast("string"))
    got = {
        (r["file"], r["seq"]): r["label"]
        for r in transfer_labels(lab_df, ins_df).collect()
    }
    exp = _python_transfer(labeled, instances)
    assert got == exp


def test_transfer_null_on_missing_position(spark):
    """A longer instance list than labeled list yields NULL labels at the
    unmatched tail (the reference would IndexError)."""
    from pyspark.sql import functions as F

    lab = spark.createDataFrame(
        [("a.json", 0, "H"), ("a.json", 1, "x")],
        "file string, seq int, label string",
    )
    ins = spark.createDataFrame(
        [("a.json", 0, "p0"), ("a.json", 1, "p1"), ("a.json", 2, "p2")],
        "file string, seq int, payload string",
    ).withColumn("label", F.lit(None).cast("string"))
    rows = {r["seq"]: r["label"] for r in transfer_labels(lab, ins).collect()}
    assert rows == {0: "x", 1: None, 2: None}


def test_pair_annotated_files(spark):
    lf = spark.createDataFrame(
        [("t1_annot.json",), ("t2_annot.json",)], "file string"
    )
    inf = spark.createDataFrame(
        [("t1.json",), ("t2.json",), ("t3.json",)], "file string"
    )
    pairs = sorted(
        (r["labeled_file"], r["instance_file"])
        for r in pair_annotated_files(lf, inf).collect()
    )
    assert pairs == [("t1_annot.json", "t1.json"),
                     ("t2_annot.json", "t2.json")]


def test_pairing_strips_only_terminal_suffix(spark):
    """A stem containing the suffix elsewhere keeps its inner occurrence;
    only the terminal _annot before the extension is stripped."""
    lf = spark.createDataFrame(
        [("paper_annotations_annot.json",)], "file string"
    )
    inf = spark.createDataFrame(
        [("paper_annotations.json",), ("paper_ations.json",)], "file string"
    )
    pairs = [
        (r["labeled_file"], r["instance_file"])
        for r in pair_annotated_files(lf, inf).collect()
    ]
    assert pairs == [("paper_annotations_annot.json",
                      "paper_annotations.json")]
