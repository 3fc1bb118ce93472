"""Custom stateful streaming operator: spans trickling in across separate
stream runs must assemble in group state (surviving restart via the
streaming checkpoint) and extract only when the end-marker arrives."""

from __future__ import annotations

from key_resource_table_extractor_spark import oracle
from key_resource_table_extractor_spark.streaming.stateful_assembly import (
    run_stateful_assembly,
)

DOC = [
    ("text", "Key Resources Table", "", 0),
    ("text", "REAGENT or RESOURCE   SOURCE   IDENTIFIER", "", 1),
    ("text", "Anti-Foo              Abcam    RRID:AB_1", "", 2),
    ("text", "Bar protein           Sigma    RRID:SCR_2", "", 3),
]


def rows_for(doc_id, spans):
    return [(doc_id, k, t, m, o) for (k, t, m, o) in spans]


def test_assembly_waits_for_end_marker_and_survives_restart(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    ddl = "doc_id string, kind string, text string, media_ref string, offset int"

    # batch 1: first half of the doc, no end marker
    spark.createDataFrame(rows_for("d0", DOC[:2]), ddl).write.parquet(inp)
    q = run_stateful_assembly(spark, inp, out, cp)
    q.awaitTermination(180)
    try:
        n0 = spark.read.parquet(out).count()
    except Exception:
        n0 = 0
    assert n0 == 0  # incomplete doc: nothing emitted, state checkpointed

    # batch 2 (separate stream run = restart): rest of doc + end marker
    spark.createDataFrame(
        rows_for("d0", DOC[2:]) + [("d0", "end", "", "", 99)], ddl
    ).write.mode("append").parquet(inp)
    q2 = run_stateful_assembly(spark, inp, out, cp)
    q2.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .orderBy("seq")
        .collect()
    )
    exp = oracle.extract_document(DOC)
    assert [(r["seq"], r["kind"], r["text"], r["media_ref"], r["offset"])
            for r in got] == [tuple(r) for r in exp]
