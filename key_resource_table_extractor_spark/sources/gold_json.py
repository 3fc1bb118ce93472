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


def gold_table_grid(tbl: dict, expand_colspans: bool = True) -> list[list]:
    """Normalized cell grid of a gold table.

    ``expand_colspans=True`` returns plain-string rows with a colspan>1
    cell's content in its first spanned column and ``""`` fillers — exactly
    what the flat text renderer below encodes. ``expand_colspans=False``
    preserves the gold-JSON cell shape ``{"content", "colspan"}``
    (reference html_table_converter.py:60-72, merge_model_data_prep.py:
    296-320) for span-aware eval (``eval.grits_topology``)."""
    grid: list[list] = []
    for row in tbl.get("rows", []):
        cells: list = []
        for cell in row:
            content = norm_cell(cell.get("content", ""))
            colspan = max(int(cell.get("colspan", 1) or 1), 1)
            if expand_colspans:
                cells.append(content)
                cells.extend([""] * (colspan - 1))
            else:
                cells.append({"content": content, "colspan": colspan})
        grid.append(cells)
    return grid


def gold_table_to_spans(tbl: dict, with_title: bool = True) -> list[tuple]:
    """Render a gold table to (kind, text, media_ref, offset) spans.

    Cells are normalized, columns padded to max width + 2 (the >=2-space
    column gap the segmenter detects); colspan>1 content is placed in its
    first spanned column. A 'Key Resources Table' title line is prepended so
    region relevance holds for tables without RRIDs (we are constructing the
    fixture document, not altering table content).
    """
    grid: list[list[str]] = []
    for row in tbl.get("rows", []):
        cells: list[str] = []
        for cell in row:
            cells.append(norm_cell(cell.get("content", "")))
            for _ in range(int(cell.get("colspan", 1)) - 1):
                cells.append("")
        grid.append(cells)
    ncols = max((len(r) for r in grid), default=0)
    for r in grid:
        r.extend([""] * (ncols - len(r)))
    widths = [
        max((len(r[c]) for r in grid), default=0) + 2 for c in range(ncols)
    ]
    lines: list[str] = []
    if with_title:
        lines.append("Key Resources Table")
    for r in grid:
        line = "".join(
            r[c].ljust(widths[c]) if c < ncols - 1 else r[c]
            for c in range(ncols)
        )
        lines.append(line.rstrip() or "")
    return [
        (spec.KIND_TEXT, t, "", off) for off, t in enumerate(lines)
    ]
