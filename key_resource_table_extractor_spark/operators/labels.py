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


# --------------------------------------------------------------------------
# driver query: positional label transfer over the shared lineitem table
# --------------------------------------------------------------------------

def q_label_transfer(spark, sf_dir):
    """Driver-gate harness for ``transfer_labels`` (reference
    scripts/label_transfer.py:12-33): each order's lineitems are the
    positional instances (file = orderkey, sequence = linenumber) and a
    labeled export of the same file carries ``l_returnflag`` as the
    label; ``offset=1`` reproduces the reference's extra-leading-
    instance shift, so the LAST instance of every order surfaces a NULL
    label (length mismatch made visible, not hidden). One window + one
    co-partitioned (file, position) equi-join — no driver loop."""
    # raw scan, NOT the rebalanced common.load: this op's contract is
    # POSITIONAL, and (orderkey, linenumber) carries ties in the driver
    # tables, so the row_number tie order must stay the file's scan
    # order (the one the DuckDB oracle sees). A pre-window round-robin
    # rebalance would reorder tie groups and scramble which label lands
    # on which duplicate row. The window's own hash exchange provides
    # the (only meaningful) parallelism.
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_orderkey") % 50 == 0
    )
    instances = src.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
    )
    labeled = src.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_returnflag").alias("label"),
    )
    return transfer_labels(
        labeled, instances,
        file_col="orderkey", seq_col="linenumber", label_col="label",
    )


SQL_LABEL_TRANSFER = """
WITH src AS (
  SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
         l_returnflag AS label
  FROM lineitem WHERE l_orderkey % 50 = 0
),
lab AS (
  SELECT orderkey,
         row_number() OVER (PARTITION BY orderkey ORDER BY linenumber) - 1
           AS pos,
         label
  FROM src
),
inst AS (
  SELECT orderkey, linenumber,
         row_number() OVER (PARTITION BY orderkey ORDER BY linenumber) AS pos
  FROM src
)
SELECT i.orderkey, i.linenumber, l.label
FROM inst i LEFT JOIN lab l ON i.orderkey = l.orderkey AND i.pos = l.pos
"""


QUERIES = {"label_transfer": q_label_transfer}
ORACLE = {"label_transfer": SQL_LABEL_TRANSFER}
