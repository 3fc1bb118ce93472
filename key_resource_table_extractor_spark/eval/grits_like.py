"""GriTS-style table-similarity scoring (evaluation harness parity).

The reference scores predictions against gold tables with GriTS —
a factored 2D most-similar-substructure alignment with LCS cell similarity
(reference scripts/grits.py:166-213,466-497, harness grits_perf_eval.py:
38-67). This is a simplified but order-preserving variant: rows are aligned
with dynamic programming maximizing summed cell similarity (cells compared
by difflib ratio, the reference's 2·|lcs|/(|a|+|b|) — grits.py:216-221),
then precision/recall/F1 are computed over cell mass. Exact on identity,
monotone under perturbation — sufficient as a regression metric for the
extraction pipeline; not a reimplementation of the full 2D-MSS.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def _cell_sim(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b).ratio()


def _row_sim(ra: list[str], rb: list[str]) -> float:
    """Aligned-column similarity (pad the shorter row)."""
    n = max(len(ra), len(rb))
    if n == 0:
        return 0.0
    total = 0.0
    for c in range(n):
        a = ra[c] if c < len(ra) else ""
        b = rb[c] if c < len(rb) else ""
        total += _cell_sim(a, b)
    return total


def grits_content(pred_rows: list[list[str]], gold_rows: list[list[str]]):
    """Returns (precision, recall, f1) over cell content mass.

    Row alignment = DP over row order (insert/delete/match), match gain =
    summed per-column cell similarity.
    """
    np_, ng = len(pred_rows), len(gold_rows)
    if np_ == 0 or ng == 0:
        return (0.0, 0.0, 0.0)
    # DP: best total cell-similarity of an order-preserving row alignment
    dp = [[0.0] * (ng + 1) for _ in range(np_ + 1)]
    for i in range(1, np_ + 1):
        for j in range(1, ng + 1):
            match = dp[i - 1][j - 1] + _row_sim(pred_rows[i - 1], gold_rows[j - 1])
            dp[i][j] = max(dp[i - 1][j], dp[i][j - 1], match)
    gained = dp[np_][ng]
    pred_mass = sum(max(len(r), 1) for r in pred_rows)
    gold_mass = sum(max(len(r), 1) for r in gold_rows)
    precision = gained / pred_mass if pred_mass else 0.0
    recall = gained / gold_mass if gold_mass else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return (precision, recall, f1)
