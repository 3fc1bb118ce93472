"""HTML/CSV rendering sinks (S7 parity) — column-expression renderings of
the nested result JSON must produce exact expected strings."""

from __future__ import annotations

from key_resource_table_extractor_spark import job
from key_resource_table_extractor_spark.functions.render import render_results


def test_render_html_csv(spark):
    doc = [
        {"kind": "text", "text": "Key Resources Table", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "REAGENT or RESOURCE   SOURCE   IDENTIFIER",
         "media_ref": "", "offset": 1},
        {"kind": "text", "text": 'A<b> "x"              Abcam    RRID:AB_1',
         "media_ref": "", "offset": 2},
    ]
    df = spark.createDataFrame(
        [("d0", doc)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    nested = job.extract_nested(df)
    out = render_results(nested).collect()[0]
    assert out["doc_id"] == "d0"
    html = out["html"][0]
    assert html.startswith("<table><tr><td>")
    assert "A&lt;b&gt; &quot;x&quot;" in html or 'A&lt;b&gt; "x"' in html
    assert "RRID:AB_1" in html
    csv = out["csv"][0]
    assert '"A<b> ""x"""' in csv
    assert csv.count("\n") >= 2  # three rows (title row + header + data)
