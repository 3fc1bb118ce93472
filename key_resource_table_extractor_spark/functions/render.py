"""HTML / CSV renderings of extraction results as derived columns.

The reference writes result tables as JSON + CSV + HTML files
(HybridTableTextContentExtractor.java:79-111, extract_tables_from_pdf.py:
130-151, html_table_converter.py:60-96 — SURVEY §2 S7). Here renderings are
pure column expressions over the nested result JSON: parse with from_json,
fold the nested arrays with higher-order functions. JVM-side end to end —
no UDFs, so rendering adds no Python boundary at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

RESULT_SCHEMA = (
    "struct<paper_id:string, result:struct<pages:array<struct<"
    "page:int, tables:array<struct<rows:array<array<string>>>>>>>>"
)


def parse_result(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, RESULT_SCHEMA)


def _html_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def html_tables(parsed: Column) -> Column:
    """One HTML <table> string per page-table, flattened across pages."""
    return F.flatten(
        F.transform(
            parsed["result"]["pages"],
            lambda page: F.transform(
                page["tables"],
                lambda tbl: F.concat(
                    F.lit("<table>"),
                    F.array_join(
                        F.transform(
                            tbl["rows"],
                            lambda row: F.concat(
                                F.lit("<tr><td>"),
                                F.array_join(
                                    F.transform(row, _html_escape),
                                    "</td><td>",
                                ),
                                F.lit("</td></tr>"),
                            ),
                        ),
                        "",
                    ),
                    F.lit("</table>"),
                ),
            ),
        )
    )


def _csv_quote(c: Column) -> Column:
    return F.concat(
        F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"')
    )


def csv_tables(parsed: Column) -> Column:
    """One CSV string per page-table (quoted cells, newline rows)."""
    return F.flatten(
        F.transform(
            parsed["result"]["pages"],
            lambda page: F.transform(
                page["tables"],
                lambda tbl: F.array_join(
                    F.transform(
                        tbl["rows"],
                        lambda row: F.array_join(
                            F.transform(row, _csv_quote), ","
                        ),
                    ),
                    "\n",
                ),
            ),
        )
    )


def render_results(nested_df: DataFrame) -> DataFrame:
    """(doc_id, result) → (doc_id, html: array<string>, csv: array<string>)."""
    parsed = parse_result("result")
    return nested_df.select(
        "doc_id",
        html_tables(parsed).alias("html"),
        csv_tables(parsed).alias("csv"),
    )
