"""GriTS-style table-similarity scoring (evaluation harness parity).

The reference scores predictions against gold tables with GriTS —
a factored 2D most-similar-substructure alignment over a matrix of cell
similarities, with one metric per cell property:

- GriTS_Content: cell similarity = LCS ratio of cell text
  (reference scripts/grits.py:216-221, 2*|lcs|/(|a|+|b|)).
- GriTS_Topology: cell similarity = IoU of the two cells' bounding
  rectangles in grid coordinates (reference scripts/grits.py:224-235,
  372-405,466-497) — structure-sensitive, content-blind.

This is a simplified but order-preserving variant of the 2D-MSS: rows are
aligned with dynamic programming maximizing summed cell similarity, cells
within aligned rows are compared positionally. Exact on identity, monotone
under perturbation — sufficient as a regression metric for the extraction
pipeline; not a reimplementation of the full 2D-MSS (which also permutes
columns via the factored transpose pass).

Tables are lists of rows; a cell is either a plain string (colspan 1) or a
``{"content": str, "colspan": int}`` dict (the gold-JSON cell shape,
reference scripts/html_table_converter.py:60-72).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def _cell_content(cell) -> str:
    if isinstance(cell, dict):
        return cell.get("content", "") or ""
    return cell or ""


def _cell_colspan(cell) -> int:
    if isinstance(cell, dict):
        return max(int(cell.get("colspan", 1) or 1), 1)
    return 1


def _cell_rowspan(cell) -> int:
    if isinstance(cell, dict):
        return max(int(cell.get("rowspan", 1) or 1), 1)
    return 1


def _cell_sim(a, b) -> float:
    a, b = _cell_content(a), _cell_content(b)
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b).ratio()


def _iou_1d(a0: int, a1: int, b0: int, b1: int) -> float:
    inter = min(a1, b1) - max(a0, b0)
    if inter <= 0:
        return 0.0
    union = max(a1, b1) - min(a0, b0)
    return inter / union


def _col_extents(row) -> list[tuple[int, int]]:
    """Grid-coordinate column interval [c0, c1) of each cell in a row."""
    out = []
    c = 0
    for cell in row:
        k = _cell_colspan(cell)
        out.append((c, c + k))
        c += k
    return out


def _topo_sim(ext_a, ext_b) -> float:
    """IoU of the two cells' column extents (rowspans are not modeled in
    the span-space rebuild: every cell is one logical row tall)."""
    return _iou_1d(ext_a[0], ext_a[1], ext_b[0], ext_b[1])


def _row_sim(ra: list, rb: list, topology: bool = False) -> float:
    """Aligned-column similarity over the shared prefix: positions beyond
    a row's own cells carry no gain (and no mass on either side)."""
    na, nb = len(ra), len(rb)
    if topology:
        ea, eb = _col_extents(ra), _col_extents(rb)
    total = 0.0
    for c in range(min(na, nb)):
        if topology:
            total += _topo_sim(ea[c], eb[c])
        else:
            total += _cell_sim(ra[c], rb[c])
    return total


def _grits(pred_rows: list[list], gold_rows: list[list], topology: bool):
    np_, ng = len(pred_rows), len(gold_rows)
    if np_ == 0 or ng == 0:
        return (0.0, 0.0, 0.0)
    # DP: best total cell-similarity of an order-preserving row alignment
    dp = [[0.0] * (ng + 1) for _ in range(np_ + 1)]
    for i in range(1, np_ + 1):
        for j in range(1, ng + 1):
            match = dp[i - 1][j - 1] + _row_sim(
                pred_rows[i - 1], gold_rows[j - 1], topology
            )
            dp[i][j] = max(dp[i - 1][j], dp[i][j - 1], match)
    gained = dp[np_][ng]
    pred_mass = sum(max(len(r), 1) for r in pred_rows)
    gold_mass = sum(max(len(r), 1) for r in gold_rows)
    precision = min(gained / pred_mass, 1.0) if pred_mass else 0.0
    recall = min(gained / gold_mass, 1.0) if gold_mass else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return (precision, recall, f1)


def grits_content(pred_rows: list[list], gold_rows: list[list]):
    """(precision, recall, f1) over cell content mass (GriTS_Con analog)."""
    return _grits(pred_rows, gold_rows, topology=False)


def grits_topology(pred_rows: list[list], gold_rows: list[list]):
    """(precision, recall, f1) over cell grid-extent IoU (GriTS_Top analog,
    reference scripts/grits.py:224-235): a content-equal prediction with the
    wrong cell structure (e.g. a spanning cell split, or two cells fused)
    scores < 1 here while grits_content may still score 1."""
    return _grits(pred_rows, gold_rows, topology=True)


def grits_both(pred_rows: list[list], gold_rows: list[list]):
    """(content_f1, topology_f1) pair — the reference reports the factored
    metrics side by side (scripts/grits.py:466-497)."""
    return (
        grits_content(pred_rows, gold_rows)[2],
        grits_topology(pred_rows, gold_rows)[2],
    )


# --------------------------------------------------------------------------
# factored 2D-MSS (row AND column alignment) — the reference's actual
# GriTS shape (scripts/grits.py:166-213 factors the 2D most-similar
# substructure into order-preserving 1D alignments over rows and columns)
# --------------------------------------------------------------------------

def _align_matrix(reward) -> tuple[list, float]:
    """Order-preserving alignment over a pre-computed (na, nb) reward
    matrix; returns (pairs, total score). Pointers are recorded in the
    forward pass with the published tie-breaking order — diagonal first,
    then skip-a, then skip-b (GriTS reference grits.py:99-117,146-161) —
    so alignments are deterministic and bit-comparable against an
    independent implementation of the same algorithm. Rewards are taken
    from a matrix rather than a callback so each (expensive) cell
    similarity is computed exactly once per factored scoring."""
    na, nb = len(reward), len(reward[0]) if len(reward) else 0
    dp = [[0.0] * (nb + 1) for _ in range(na + 1)]
    ptr = [[0] * (nb + 1) for _ in range(na + 1)]
    for i in range(1, na + 1):
        ptr[i][0] = -1
    for j in range(1, nb + 1):
        ptr[0][j] = 1
    for i in range(1, na + 1):
        row = reward[i - 1]
        for j in range(1, nb + 1):
            match = dp[i - 1][j - 1] + row[j - 1]
            skip_a = dp[i - 1][j]
            skip_b = dp[i][j - 1]
            best = max(match, skip_a, skip_b)
            dp[i][j] = best
            if match == best:
                ptr[i][j] = 0
            elif skip_a == best:
                ptr[i][j] = -1
            else:
                ptr[i][j] = 1
    pairs = []
    i, j = na, nb
    while i or j:
        p = ptr[i][j]
        if p == -1:
            i -= 1
        elif p == 1:
            j -= 1
        else:
            i -= 1
            j -= 1
            pairs.append((i, j))
    pairs.reverse()
    return pairs, dp[na][nb]


def _gain_matrix(reward) -> float:
    """DP total only, over a pre-computed reward matrix."""
    na = len(reward)
    nb = len(reward[0]) if na else 0
    dp = [[0.0] * (nb + 1) for _ in range(na + 1)]
    for i in range(1, na + 1):
        row = reward[i - 1]
        for j in range(1, nb + 1):
            dp[i][j] = max(
                dp[i - 1][j - 1] + row[j - 1], dp[i - 1][j], dp[i][j - 1]
            )
    return dp[na][nb]


def _grid_of(rows) -> list[list[str]]:
    """Rectangular content grid under HTML occupancy semantics (the
    reference's html-to-cells walk, grits.py:420-450): a colspan/rowspan
    dict cell occupies its covered positions, shifting later cells in the
    same and following rows past them. Content lands in the FIRST covered
    position, covered fillers are "" (repo convention — the reference fills
    every covered position with the full text; ours keeps mass = one cell).
    Rows shorter than the grid width are padded with None (no mass)."""
    nrows = len(rows)
    cells_at: dict[tuple, str] = {}
    pending: dict[int, set] = {}
    for ri, row in enumerate(rows):
        occ = pending.get(ri, set())
        c = 0
        for cell in row:
            k, r = _cell_colspan(cell), _cell_rowspan(cell)
            while c in occ:
                c += 1
            cells_at[(ri, c)] = _cell_content(cell)
            for cc in range(c + 1, c + k):
                cells_at[(ri, cc)] = ""
            for rr in range(ri + 1, min(ri + r, nrows)):
                pending.setdefault(rr, set()).update(range(c, c + k))
            c += k
    for rr, cols in pending.items():  # rowspan-covered fillers
        if rr < nrows:
            for cc in cols:
                cells_at.setdefault((rr, cc), "")
    width = max((c for (_r, c) in cells_at), default=-1) + 1
    return [
        [cells_at.get((r, c), None) for c in range(width)]
        for r in range(nrows)
    ]


def _sim_or_pad(a, b) -> float:
    if a is None or b is None:  # rectangle padding carries no gain
        return 0.0
    return _cell_sim(a, b)


def grits_factored(pred_rows: list[list], gold_rows: list[list]):
    """(precision, recall, f1, upper_bound) under the factored 2D-MSS: rows
    and columns are EACH aligned by an independent order-preserving DP
    whose pairwise reward is the free inner 1D alignment (rows on the
    grids, columns on the transposed grids), and the consistent gain is
    summed over aligned (row, column) intersections — the published
    polynomial factorization of the NP-hard 2D-MSS (Smock et al., GriTS;
    reference grits.py:166-213). Unlike the positional variant above, a
    spurious inserted/deleted COLUMN only costs its own mass instead of
    shifting every later column off alignment.

    ``upper_bound`` is the reference's diagnostic f-score bound on the true
    (NP-hard) 2D-MSS (grits.py:199-205,214): the min of the row-stage and
    column-stage alignment gains where each stage grants every outer pair a
    FREE inner 1D alignment. The consistent factored gain can never exceed
    either stage's free gain, so ``f1 <= upper_bound`` always; a gap means
    the prediction's row and column structure cannot be reconciled by any
    single consistent alignment (structure misalignment, not content loss).
    """
    gp, gg = _grid_of(pred_rows), _grid_of(gold_rows)
    if not gp or not gg or not gp[0] or not gg[0]:
        return (0.0, 0.0, 0.0, 0.0)
    ng, ncg = len(gg), len(gg[0])
    npr, ncp = len(gp), len(gp[0])
    # memoized pairwise cell rewards (the reference's pre_computed_rewards,
    # grits.py:180-190): every (gold-cell, pred-cell) LCS similarity is
    # computed exactly once — the SequenceMatcher is the dominant eval
    # cost and the old callback form re-ran it once per stage. A content
    # cache folds the (very common) repeated "" / identical-text pairs.
    sim_cache: dict = {}

    def _sim(a, b) -> float:
        key = (
            a if isinstance(a, str) or a is None else _cell_content(a),
            b if isinstance(b, str) or b is None else _cell_content(b),
        )
        v = sim_cache.get(key)
        if v is None:
            v = _sim_or_pad(a, b)
            sim_cache[key] = v
        return v

    R = [
        [
            [[_sim(gg[i][j], gp[k][l]) for l in range(ncp)]
             for k in range(npr)]
            for j in range(ncg)
        ]
        for i in range(ng)
    ]
    # both stages use the FREE inner 1D alignment as the pairwise reward
    # and align independently (rows on the grids, columns on the
    # transposed grids), exactly as published (reference grits.py:166-213:
    # align_2d_outer over rows, then over the transpose); gold is the
    # first sequence so skip-gold wins ties over skip-pred, matching the
    # reference's pointer convention
    row_reward = [
        [
            _gain_matrix([[R[i][j][k][l] for l in range(ncp)]
                          for j in range(ncg)])
            for k in range(npr)
        ]
        for i in range(ng)
    ]
    col_reward = [
        [
            _gain_matrix([[R[i][j][k][l] for k in range(npr)]
                          for i in range(ng)])
            for l in range(ncp)
        ]
        for j in range(ncg)
    ]
    row_pairs, row_gain = _align_matrix(row_reward)   # (gold_i, pred_k)
    col_pairs, col_gain = _align_matrix(col_reward)   # (gold_j, pred_l)
    gained = sum(
        R[i][j][k][l]
        for i, k in row_pairs
        for j, l in col_pairs
    )
    # mass = real (non-padding) grid positions, matching the expanded gain
    pred_mass = sum(1 for r in gp for c in r if c is not None) or 1
    gold_mass = sum(1 for r in gg for c in r if c is not None) or 1

    def _fscore(gain: float):
        p = min(gain / pred_mass, 1.0)
        r = min(gain / gold_mass, 1.0)
        return (p, r, 2 * p * r / (p + r) if p + r else 0.0)

    precision, recall, f1 = _fscore(gained)
    upper_bound = _fscore(min(row_gain, col_gain))[2]
    return (precision, recall, f1, upper_bound)
