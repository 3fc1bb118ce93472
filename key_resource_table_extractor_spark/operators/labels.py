"""Positional label transfer between instance formats.

The reference ships a one-off annotation tool (scripts/
label_transfer.py:12-33) that copies human labels from an annotated
instance file onto a regenerated instance file of the same document by
LIST POSITION, with a fixed offset (the annotated export carries one
extra leading instance, hence ``labeled[i + 1] -> instances[i]``), and
pairs files by name (``*_annot.json`` -> ``*.json``,
label_transfer.py:22-33).

Spark-first shape: both sides get a per-file ``row_number`` over an
explicit sequence column (DataFrames have no list order — the caller
names the column that carries it), then a single equi-join on
``(file, position)`` — one co-partitioned shuffle keyed by file, no
driver materialization, so a million annotated files transfer as one
job instead of the reference's per-file Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transfer_labels(
    labeled: DataFrame,
    instances: DataFrame,
    *,
    file_col: str = "file",
    seq_col: str = "seq",
    label_col: str = "label",
    offset: int = 1,
) -> DataFrame:
    """Copy ``label_col`` from ``labeled`` onto ``instances`` by per-file
    position: instance ``i`` takes the label of labeled row ``i + offset``
    (reference label_transfer.py:16-18). Instances with no labeled
    counterpart at their shifted position keep a NULL label — surfacing
    length mismatches instead of hiding them (the reference would raise
    IndexError mid-write)."""
    pos = F.row_number().over(
        Window.partitionBy(file_col).orderBy(seq_col)
    )
    lab = labeled.select(
        F.col(file_col).alias("__lt_file"),
        (pos - F.lit(offset)).alias("__lt_pos"),
        F.col(label_col).alias("__lt_label"),
    )
    inst = instances.withColumn("__lt_pos", pos)
    out_cols = [
        c for c in instances.columns if c != label_col
    ]
    return (
        inst.join(
            lab,
            (inst[file_col] == lab["__lt_file"])
            & (inst["__lt_pos"] == lab["__lt_pos"]),
            "left",
        )
        .select(*out_cols, F.col("__lt_label").alias(label_col))
    )


def pair_annotated_files(
    labeled_files: DataFrame, instance_files: DataFrame,
    *, suffix: str = "_annot",
) -> DataFrame:
    """File-name pairing (reference label_transfer.py:25-28): each
    ``<stem>_annot<ext>`` labeled file pairs with the ``<stem><ext>``
    instance file. Returns ``(labeled_file, instance_file)`` via an
    equi-join on the stripped name — broadcastable when the annotated
    set is small (it always is: it is human-made). Only the TERMINAL
    suffix before the extension is stripped (a stem that happens to
    contain the suffix elsewhere, e.g. ``paper_annotations_annot.json``,
    keeps its inner occurrence), and the suffix is treated as a literal,
    not a regex."""
    import re

    stripped = F.regexp_replace(
        "file", re.escape(suffix) + r"(?=\.[^.]*$)", ""
    )
    lf = labeled_files.select(
        F.col("file").alias("labeled_file"), stripped.alias("__stem")
    )
    inf = instance_files.select(
        F.col("file").alias("instance_file"), F.col("file").alias("__s2")
    )
    return (
        lf.join(F.broadcast(inf), lf["__stem"] == inf["__s2"])
        .select("labeled_file", "instance_file")
    )
