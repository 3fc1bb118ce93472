"""HTML ⇄ gold-table-JSON conversion (eval-side fixture tooling).

The reference renders its hand-annotated gold tables to HTML
(``scripts/html_table_converter.py:60-96``: one ``<table>`` per gold JSON,
``colspan``/``rowspan`` attributes, escaped content). This module provides
both directions so an HTML table corpus can be ingested as extraction
fixtures (→ ``gold_json.gold_table_to_spans``) and gold JSON can be
round-tripped out for inspection:

- ``gold_table_to_html(tbl)``  — gold dict → ``<table>`` markup
- ``html_to_gold_tables(markup)`` — ``<table>`` markup → list of gold dicts

Parsing uses only the stdlib ``html.parser`` (no external deps in the
container); nested tables are not supported (the gold corpus has none).
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser


def gold_table_to_html(tbl: dict) -> str:
    """Render a gold table dict to the reference's HTML shape."""
    out = ["<table>"]
    for row in tbl.get("rows", []):
        out.append("<tr>")
        for cell in row:
            attrs = ""
            colspan = int(cell.get("colspan", 1) or 1)
            rowspan = int(cell.get("rowspan", 1) or 1)
            if colspan > 1:
                attrs += f' colspan="{colspan}"'
            if rowspan > 1:
                attrs += f' rowspan="{rowspan}"'
            content = escape((cell.get("content", "") or "").strip())
            out.append(f"<td{attrs}>{content}</td>")
        out.append("</tr>")
    out.append("</table>")
    return "\n".join(out)


class _TableParser(HTMLParser):
    """Collects (name-less) gold table dicts from ``<table>`` markup."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[dict] = []
        self._rows: list[list[dict]] | None = None
        self._row: list[dict] | None = None
        self._cell: dict | None = None
        self._text: list[str] = []

    def _flush_cell(self):
        # convert_charrefs=True already decodes entities in handle_data —
        # a second unescape() here would corrupt content whose DECODED form
        # contains entity-like text ("use &amp; literally" → "use &")
        if self._cell is not None:
            self._cell["content"] = "".join(self._text).strip()
            self._row.append(self._cell)
            self._cell = None

    def _flush_row(self):
        self._flush_cell()
        if self._row is not None:
            if self._row:
                self._rows.append(self._row)
            self._row = None

    def handle_starttag(self, tag, attrs):
        # HTML5 allows omitting </td>/</th>/</tr>: a new cell or row start
        # implicitly closes the open one — flush instead of dropping it
        if tag == "table":
            self._rows = []
        elif tag == "tr" and self._rows is not None:
            self._flush_row()
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._flush_cell()
            a = dict(attrs)
            self._cell = {
                "content": "",
                "colspan": int(a.get("colspan", 1) or 1),
            }
            if int(a.get("rowspan", 1) or 1) > 1:
                self._cell["rowspan"] = int(a["rowspan"])
            self._text = []

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag == "tr":
            self._flush_row()
        elif tag == "table" and self._rows is not None:
            self._flush_row()
            self.tables.append({"rows": self._rows})
            self._rows = None

    def handle_data(self, data):
        if self._cell is not None:
            self._text.append(data)


def html_to_gold_tables(markup: str, name: str | None = None) -> list[dict]:
    """Parse ``<table>`` markup into gold table dicts
    (``{"name", "rows": [[{"content", "colspan"}...]]}``) — the ingest
    direction the reference lacks (it only renders JSON → HTML)."""
    p = _TableParser()
    p.feed(markup)
    p.close()
    for i, t in enumerate(p.tables):
        t["name"] = name if (name and len(p.tables) == 1) else (
            f"{name or 'table'}_{i}"
        )
    return p.tables
