"""Pure-Python reference implementation (the executable spec).

One document at a time, plain loops, no numpy/pandas — deliberately written
independently of the vectorized implementation in ``extractor/`` so the
span-sequence-equality tests compare two genuinely different code paths that
must agree on every threshold in ``spec.py``.

Input:  list of spans ``(kind, text, media_ref, offset)`` for one document.
Output: ordered list of output spans ``(seq, kind, text, media_ref, offset)``
        — the key-resource tables of the document flattened in
        page→table→row→cell traversal order (SURVEY.md §2 W5), with boundary
        media spans passed through in offset order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

from . import spec

_GAP_RE = re.compile(spec.GAP_REGEX)


@lru_cache(maxsize=8)
def _gap_re(min_spaces: int):
    return re.compile(spec.gap_regex(min_spaces))
_RRID_RE = re.compile(spec.RRID_REGEX)
_HEADER_WORD_RES = [re.compile(r"\b%s\b" % kw) for kw in spec.HEADER_KEYWORDS]


@dataclass
class Line:
    """One physical text line with its derived layout features."""

    offset: int
    text: str
    segs: list[tuple[int, int, str]] = field(default_factory=list)
    has_rrid: bool = False
    is_header: bool = False
    in_table: bool = False

    @property
    def n_segs(self) -> int:
        return len(self.segs)

    @property
    def is_blank(self) -> bool:
        return not self.segs

    @property
    def indent(self) -> int:
        return self.segs[0][0] if self.segs else 0


def split_segments(
    text: str, gap_min_spaces: int = spec.GAP_MIN_SPACES
) -> list[tuple[int, int, str]]:
    """Maximal runs of text between column gaps, with char positions."""
    gap_re = _GAP_RE if gap_min_spaces == spec.GAP_MIN_SPACES else _gap_re(
        gap_min_spaces
    )
    segs = []
    pos = 0
    for m in gap_re.finditer(text):
        chunk = text[pos : m.start()]
        if chunk.strip():
            s = pos + (len(chunk) - len(chunk.lstrip()))
            segs.append((s, s + len(chunk.strip()), chunk.strip()))
        pos = m.end()
    chunk = text[pos:]
    if chunk.strip():
        s = pos + (len(chunk) - len(chunk.lstrip()))
        segs.append((s, s + len(chunk.strip()), chunk.strip()))
    return segs


def _is_section_header(seg_text: str) -> bool:
    """Short Title-case line with no terminal punctuation (spec rule)."""
    return (
        seg_text[:1].isupper()
        and len(seg_text.split(" ")) <= spec.SECTION_HEADER_MAX_WORDS
        and not seg_text.endswith(spec.SECTION_HEADER_END_PUNCT)
    )


def is_header_line(text: str) -> bool:
    up = text.upper()
    if spec.HEADER_TITLE in up:
        return True
    hits = sum(1 for r in _HEADER_WORD_RES if r.search(up))
    return hits >= spec.HEADER_MIN_KEYWORDS


def analyze_lines(
    spans: list[tuple], gap_min_spaces: int = spec.GAP_MIN_SPACES
) -> list[Line]:
    """Feature pass over the text spans of one doc (offset-sorted)."""
    lines: list[Line] = []
    for kind, text, media_ref, offset in spans:
        if kind != spec.KIND_TEXT:
            continue
        ln = Line(offset=offset, text=text,
                  segs=split_segments(text, gap_min_spaces))
        ln.has_rrid = bool(_RRID_RE.search(text))
        ln.is_header = is_header_line(text)
        lines.append(ln)
    # base in-table rule + previous-line continuation threading
    prev_in_table = False
    for ln in lines:
        base = ln.n_segs >= spec.MIN_SEGS_IN_TABLE or ln.has_rrid or ln.is_header
        cont = (
            ln.n_segs == 1
            and ln.indent >= spec.CONTINUATION_MIN_INDENT
            and prev_in_table
        )
        sect = (
            ln.n_segs == 1
            and prev_in_table
            and _is_section_header(ln.segs[0][2])
        )
        ln.in_table = base or cont or sect
        if not ln.is_blank:
            prev_in_table = ln.in_table
    # annotation gap fill: short non-blank runs between two in-table lines
    idx_in = [i for i, ln in enumerate(lines) if ln.in_table]
    for a, b in zip(idx_in, idx_in[1:]):
        mid = lines[a + 1 : b]
        if 0 < len(mid) <= spec.GAP_FILL_MAX and all(not m.is_blank for m in mid):
            for m in mid:
                m.in_table = True
    return lines


def find_regions(lines: list[Line]) -> list[tuple[int, int]]:
    """Maximal runs of in-table lines, kept when relevant (header or RRID)."""
    regions = []
    i = 0
    n = len(lines)
    while i < n:
        if not lines[i].in_table:
            i += 1
            continue
        j = i
        while j + 1 < n and lines[j + 1].in_table:
            j += 1
        run = lines[i : j + 1]
        if len(run) >= spec.MIN_REGION_LINES and any(
            ln.is_header or ln.has_rrid for ln in run
        ):
            regions.append((i, j))
        i = j + 1
    return regions


def column_ranges(lines: list[Line]) -> list[tuple[int, int]]:
    """Interval union of multi-segment lines' segments → column trap ranges."""
    ivals = sorted(
        (s, e)
        for ln in lines
        if ln.n_segs >= spec.MIN_SEGS_IN_TABLE
        for (s, e, _t) in ln.segs
    )
    merged: list[list[int]] = []
    for s, e in ivals:
        if merged and s <= merged[-1][1] + spec.COLUMN_MERGE_TOL:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged]


def assign_cells(ln: Line, cols: list[tuple[int, int]]) -> list[str]:
    """Place each segment into the column with max overlap (leftmost tie)."""
    ncols = len(cols)
    cells: list[list[str]] = [[] for _ in range(ncols)]
    for s, e, t in ln.segs:
        best, best_ov = None, 0
        for c, (cs, ce) in enumerate(cols):
            ce_eff = ce if c < ncols - 1 else max(ce, e)  # last column extends
            ov = min(e, ce_eff) - max(s, cs)
            if ov > best_ov:
                best, best_ov = c, ov
        if best is None:
            best = 0
            for c, (cs, _ce) in enumerate(cols):
                if cs <= s:
                    best = c
        cells[best].append(t)
    return [" ".join(c) for c in cells]


def merge_votes(upper: list[str], lower: list[str]) -> bool:
    """Per-column continuation votes; strict majority >= threshold merges."""
    ncols = len(upper)
    if spec.MERGE_REQUIRES_EMPTY_CELL and all(c != "" for c in lower):
        return False
    votes = 0
    for c in range(ncols):
        lo = lower[c]
        if lo == "":
            score = spec.EMPTY_CELL_VOTE
        elif (
            lo[0].islower()
            or lo[0] in spec.CONTINUATION_LEADING_CHARS
            or upper[c].endswith(spec.DANGLING_SUFFIXES)
        ):
            score = 1.0
        else:
            score = 0.0
        if score >= spec.MERGE_VOTE_THRESHOLD:
            votes += 1
    return votes * 2 > ncols


def _normalize_excepted(indices, n: int) -> set[int]:
    """Python-style index normalization: negative counts from the end;
    out-of-range entries are ignored (reference PDFTableExtractor2.java:
    93-128,559-563 — excepted lines/pages accept negative indices)."""
    out = set()
    for ix in indices or ():
        j = ix if ix >= 0 else n + ix
        if 0 <= j < n:
            out.add(j)
    return out


def extract_document(
    spans: list[tuple],
    merge_rows: bool = True,
    excepted_lines: list[int] | None = None,
    excepted_pages: list[int] | None = None,
    row_model: str | None = None,
    gap_min_spaces: int = spec.GAP_MIN_SPACES,
) -> list[tuple]:
    """Full cascade for one doc. spans: (kind, text, media_ref, offset).

    ``merge_rows=False`` disables the continuation-merge phase (the
    reference's use_row_info pipeline-A semantics).

    ``row_model`` selects the merge mechanism explicitly:
    - ``"votes"`` (default when ``merge_rows``): per-column continuation
      votes, the reference's GPT pair model twin (row_merger.py:60-71);
    - ``"anchor"``: geometric second row model, the use_row_info/J4 analog
      (reference PDFTableExtractor2.java:334-380): a detected row starts at
      every physical row whose FIRST column is non-empty; anchor-less rows
      fold into the detected row above (the char-space reduction of the
      enclosure + overlap>=0.7 / >0.5-with-empty-columns rules — in exact
      character space overlap is binary, and a row lacking its col-0 anchor
      necessarily has an empty column);
    - ``"none"``: physical rows emitted as-is.

    ``excepted_lines``: indices into the doc's offset-sorted text-line
    sequence to drop BEFORE analysis (as if absent from the document);
    ``excepted_pages``: indices into the detected-region sequence (the
    page/table unit of the span-space rebuild) to skip. Both accept
    negative indices (reference PDFTableExtractor2.java:93-128,641-651).
    """
    spans = sorted(spans, key=lambda s: s[3])
    if excepted_lines:
        text_pos = [i for i, s in enumerate(spans) if s[0] == spec.KIND_TEXT]
        drop = {
            text_pos[j]
            for j in _normalize_excepted(excepted_lines, len(text_pos))
        }
        spans = [s for i, s in enumerate(spans) if i not in drop]
    lines = analyze_lines(spans, gap_min_spaces)
    regions = find_regions(lines)
    if excepted_pages:
        excl = _normalize_excepted(excepted_pages, len(regions))
        regions = [r for i, r in enumerate(regions) if i not in excl]
    media = [s for s in spans if s[0] == spec.KIND_MEDIA]

    out: list[tuple] = []
    seq = 0
    # dedupe boundary media by span *index*, not offset value: offsets are
    # not required to be unique (DOCUMENT_SPANS_SCHEMA), and the vectorized
    # pipeline keys its media_used mask by index — both must agree
    emitted_media: set[int] = set()
    for i, j in regions:
        run = lines[i : j + 1]
        cols = column_ranges(run)
        if len(cols) < spec.MIN_COLUMNS:
            continue
        ncols = len(cols)
        # physical rows (drop blank/all-empty rows up front — F3)
        rows: list[tuple[int, list[str], bool]] = []  # (offset, cells, is_header)
        for ln in run:
            cells = assign_cells(ln, cols)
            if any(c != "" for c in cells):
                rows.append((ln.offset, cells, ln.is_header))
        if not rows:
            continue
        # merge phase: vote/anchor vs physical predecessor, transitive chase
        mode = row_model or ("votes" if merge_rows else "none")
        groups: list[list[tuple[int, list[str]]]] = []
        for k, (off, cells, is_hdr) in enumerate(rows):
            if mode == "anchor":
                do_merge = k > 0 and not is_hdr and cells[0] == ""
            elif mode == "votes":
                do_merge = (
                    k > 0 and not is_hdr and merge_votes(rows[k - 1][1], cells)
                )
            else:
                do_merge = False
            if do_merge:
                groups[-1].append((off, cells))
            else:
                groups.append([(off, cells)])
        logical: list[tuple[int, list[str]]] = []
        for g in groups:
            folded = []
            for c in range(ncols):
                parts = [cells[c] for _off, cells in g if cells[c] != ""]
                folded.append(" ".join(parts))
            logical.append((g[0][0], folded))
        # interleave with boundary media by offset
        lo = run[0].offset - spec.MEDIA_BOUNDARY_SLACK
        hi = run[-1].offset + spec.MEDIA_BOUNDARY_SLACK
        events: list[tuple[int, int, tuple]] = []  # (offset, order, payload)
        for mi, m in enumerate(media):
            if lo <= m[3] <= hi and mi not in emitted_media:
                emitted_media.add(mi)
                events.append((m[3], 0, m))
        for off, cells in logical:
            events.append((off, 1, ("row", cells, off)))
        events.sort(key=lambda e: (e[0], e[1]))
        for _off, _o, payload in events:
            if payload[0] == "row":
                _tag, cells, off = payload
                for c in range(ncols):
                    out.append((seq, spec.KIND_TEXT, cells[c], "", off))
                    seq += 1
            else:
                _kind, text, media_ref, off = payload
                out.append((seq, spec.KIND_MEDIA, "", media_ref, off))
                seq += 1
    return out
