"""From-scratch fuzzy string scoring (rapidfuzz is not available here).

Reimplements the scoring surface the reference uses from rapidfuzz
(validation/anchors.py:54 `fuzz.partial_token_sort_ratio`): sort the tokens of
both strings, then take the best local-alignment similarity of the shorter
against the longer, scaled to 0-100. Pure deterministic Python — shared by the
golden oracle (per document) and the Spark pandas UDF (per Arrow batch).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def _token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def partial_ratio(short: str, long: str) -> float:
    """Best SequenceMatcher ratio of `short` against any same-length window of
    `long`, scaled to 0-100. Windows advance by whole characters."""
    if not short or not long:
        return 0.0
    if len(short) > len(long):
        short, long = long, short
    n = len(short)
    best = 0.0
    sm = SequenceMatcher(a=short, autojunk=False)
    # Slide over candidate windows anchored at block matches to stay O(n·m/n).
    step = max(1, n // 4)
    for start in range(0, len(long) - n + 1, step):
        sm.set_seq2(long[start : start + n])
        r = sm.ratio()
        if r > best:
            best = r
            if best == 1.0:
                break
    return best * 100.0


def partial_token_sort_ratio(s1: str, s2: str) -> float:
    """Token-sorted partial ratio, 0-100."""
    return partial_ratio(_token_sort(s1.lower()), _token_sort(s2.lower()))


def partial_ratio_at_least(short: str, long: str, threshold: float) -> bool:
    """True iff some same-length window of ``long`` (every offset) matches
    ``short`` with SequenceMatcher ratio*100 >= threshold.

    Vectorized pruning: difflib's ``quick_ratio`` upper bound
    (2*sum_c min(count_a[c], count_win[c]) / 2n) is computed for ALL window
    offsets at once via numpy sliding character histograms (prefix sums per
    distinct char of ``short`` — chars outside it contribute 0 to the min).
    Only offsets clearing the bound run the exact (quadratic) ratio. The
    bound >= ratio, so no qualifying window is ever skipped."""
    import numpy as np

    if not short or not long:
        return 0.0 >= threshold
    if len(short) > len(long):
        short, long = long, short
    n = len(short)
    arr = np.frombuffer(long.encode("utf-32-le"), dtype=np.uint32)
    sarr = np.frombuffer(short.encode("utf-32-le"), dtype=np.uint32)
    chars, s_counts = np.unique(sarr, return_counts=True)
    n_windows = len(long) - n + 1
    overlap = np.zeros(n_windows, dtype=np.int64)
    for c, sc in zip(chars, s_counts):
        cum = np.concatenate(([0], np.cumsum(arr == c)))
        win = cum[n:] - cum[:-n]
        overlap += np.minimum(win, sc)
    bound = overlap * (100.0 / n)  # == quick_ratio * 100 for equal lengths
    candidates = np.nonzero(bound >= threshold)[0]
    if len(candidates) == 0:
        return False
    sm = SequenceMatcher(a=short, autojunk=False)
    # best-bound-first: the likeliest window exits the loop immediately
    for start in candidates[np.argsort(-bound[candidates], kind="stable")]:
        sm.set_seq2(long[int(start) : int(start) + n])
        if sm.ratio() * 100.0 >= threshold:
            return True
    return False


def token_sort_gate(anchor: str, token_sorted_text: str, threshold: float) -> bool:
    """``partial_token_sort_ratio(anchor, text) >= threshold`` given the
    text's token-sorted form precomputed once per document (the sort is the
    other per-anchor cost worth hoisting)."""
    return partial_ratio_at_least(_token_sort(anchor.lower()), token_sorted_text, threshold)
