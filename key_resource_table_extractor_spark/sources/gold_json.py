"""Reconstruct span documents from gold-standard table JSON.

The reference evaluates against hand-annotated tables shaped
``{"name": ..., "rows": [[{"colspan": 1, "content": "..."}]]}``
(reference scripts/html_table_converter.py:60-72; FIXTURES.md §3). This
module renders such a table back into an aligned fixed-width text block —
the span-stream shape our extractor consumes — so the bundled gold corpus
doubles as extraction fixtures.
"""

from __future__ import annotations

import json
import os
import re

from .. import spec

_WS = re.compile(r"\s+")


def norm_cell(content: str) -> str:
    """Collapse internal whitespace (a cell must not contain column gaps)."""
    return _WS.sub(" ", (content or "")).strip()


def load_gold_tables(gold_dir: str) -> list[dict]:
    out = []
    for fname in sorted(os.listdir(gold_dir)):
        if fname.endswith(".json"):
            with open(os.path.join(gold_dir, fname)) as f:
                out.append(json.load(f))
    return out


def _layout_rows(tbl: dict) -> list[list[tuple]]:
    """HTML-occupancy layout of a gold table: one list of
    ``(col_start, content, colspan, is_rowspan_filler)`` per row. A
    rowspan>1 cell occupies its columns in the following rows (standard
    table semantics, reference grits.py:420-450); covered positions appear
    as empty filler entries so later cells shift past them."""
    rows_in = tbl.get("rows", [])
    pending: dict[int, list] = {}  # row -> [(col_start, colspan), ...]
    out: list[list[tuple]] = []
    for ri, row in enumerate(rows_in):
        covered = sorted(pending.pop(ri, []))
        occ = {c for s, k in covered for c in range(s, s + k)}
        cells: list[tuple] = [(s, "", k, True) for s, k in covered]
        c = 0
        for cell in row:
            content = norm_cell(cell.get("content", ""))
            colspan = max(int(cell.get("colspan", 1) or 1), 1)
            rowspan = max(int(cell.get("rowspan", 1) or 1), 1)
            while any(x in occ for x in range(c, c + colspan)):
                c += 1
            cells.append((c, content, colspan, False))
            for rr in range(ri + 1, min(ri + rowspan, len(rows_in))):
                pending.setdefault(rr, []).append((c, colspan))
            c += colspan
        cells.sort()
        out.append(cells)
    return out


def gold_table_grid(tbl: dict, expand_colspans: bool = True) -> list[list]:
    """Normalized cell grid of a gold table under HTML occupancy semantics
    (colspan AND rowspan shift later cells past their covered positions).

    ``expand_colspans=True`` returns plain-string rows with a spanning
    cell's content in its first covered column and ``""`` fillers (covered
    columns AND rowspan-covered rows) — exactly what the flat text renderer
    below encodes. ``expand_colspans=False`` preserves the gold-JSON cell
    shape ``{"content", "colspan"}`` (reference html_table_converter.py:
    60-72, merge_model_data_prep.py:296-320) for span-aware eval
    (``eval.grits_topology``); rowspan-covered positions appear as empty
    filler cells so column extents stay aligned."""
    grid: list[list] = []
    for cells in _layout_rows(tbl):
        row_out: list = []
        for _c, content, colspan, _filler in cells:
            if expand_colspans:
                row_out.append(content)
                row_out.extend([""] * (colspan - 1))
            else:
                row_out.append({"content": content, "colspan": colspan})
        grid.append(row_out)
    return grid


def gold_table_to_spans(tbl: dict, with_title: bool = True) -> list[tuple]:
    """Render a gold table to (kind, text, media_ref, offset) spans.

    Realistic fixed-width layout (what a PDF-to-text pass of the same table
    would yield): column widths come from colspan-1 cells (max content + 2,
    the >=2-space gap the segmenter detects); a colspan>1 cell's content
    FLOWS across the combined width of its covered columns (crossing the
    column gaps — this is what makes mid-row spanning cells physically
    recoverable), widening its last covered column only when the content
    doesn't fit. Rowspan-covered positions render as blanks in the covered
    rows (the value is printed once, standard table layout). A 'Key
    Resources Table' title line is prepended so region relevance holds for
    tables without RRIDs (we are constructing the fixture document, not
    altering table content).
    """
    layout = _layout_rows(tbl)
    ncols = max(
        (c + k for cells in layout for (c, _t, k, _f) in cells), default=0
    )
    widths = [2] * ncols
    for cells in layout:  # pass 1: colspan-1 cells set base widths
        for c, content, k, _f in cells:
            if k == 1:
                widths[c] = max(widths[c], len(content) + 2)
    for cells in layout:  # pass 2: widen for spanning content that overflows
        for c, content, k, _f in cells:
            if k > 1:
                deficit = len(content) + 2 - sum(widths[c : c + k])
                if deficit > 0:
                    widths[c + k - 1] += deficit
    col_pos = [0] * (ncols + 1)
    for c in range(ncols):
        col_pos[c + 1] = col_pos[c] + widths[c]
    lines: list[str] = []
    if with_title:
        lines.append("Key Resources Table")
    for cells in layout:
        buf = [" "] * col_pos[ncols]
        for c, content, _k, _f in cells:
            start = col_pos[c]
            buf[start : start + len(content)] = content
        lines.append("".join(buf).rstrip() or "")
    return [
        (spec.KIND_TEXT, t, "", off) for off, t in enumerate(lines)
    ]
