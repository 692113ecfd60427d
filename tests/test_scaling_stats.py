"""Pure-Python tests for the scaling-evidence statistics (scripts/scaling.py).

The graded artifact (BENCH_scaling.json) is produced by make_pair /
summarize_pairs; these tests pin the clean/mem_stable/quiet criteria and
the median selection so a refactor cannot silently change what the
headline number means. No Spark, no subprocesses.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from scaling import make_pair, summarize_pairs  # noqa: E402


def _pair(it, eff, ctl=1.0, mem=1000.0, ratio=2.0):
    """Pair with job rates chosen to land exactly at `eff`, flat controls."""
    j_lo = 1000.0
    j_hi = eff * ratio * j_lo
    return make_pair(it, ratio, j_lo, j_hi,
                     (100.0, ctl * ratio * 100.0, 100.0, ctl * ratio * 100.0),
                     (mem, mem * ratio, mem, mem * ratio))


def test_make_pair_eff_and_clean():
    p = _pair(0, 0.9)
    assert p["eff"] == 0.9
    assert p["clean"] and p["mem_stable"]
    assert p["ctl_before"] == 1.0 and p["ctl_after"] == 1.0
    assert p["eff_vs_cpu_ceiling"] == 0.9


def test_make_pair_dirty_alu_control():
    # hi-arm ALU control ran 30% slow (co-tenant): not clean, and the
    # ceiling-normalized eff rises accordingly.
    p = make_pair(0, 2.0, 1000.0, 1400.0,
                  (100.0, 140.0, 100.0, 140.0),  # ctl eff 0.7 both brackets
                  (1000.0, 2000.0, 1000.0, 2000.0))
    assert not p["clean"]
    assert p["eff"] == 0.7
    assert p["eff_vs_cpu_ceiling"] == 1.0


def test_make_pair_mem_episode_flagged():
    # lo-arm memory bracket halves between before and after: a bandwidth
    # episode started inside the window.
    p = make_pair(0, 2.0, 1000.0, 1800.0,
                  (100.0, 200.0, 100.0, 200.0),
                  (2000.0, 4000.0, 900.0, 4000.0))
    assert p["clean"]            # ALU control never sensed it
    assert not p["mem_stable"]   # the bandwidth bracket did


def test_summary_median_of_clean_pairs_only():
    pairs = [
        _pair(0, 0.85),
        _pair(1, 0.83),
        _pair(2, 0.30, ctl=0.7),   # dirty window — excluded from the median
        _pair(3, 0.81),
    ]
    s = summarize_pairs(pairs, 2.0, 192000, 8, 16)
    assert s["n_pairs"] == 4 and s["n_clean_pairs"] == 3
    assert s["median_clean_pair_eff"] == 0.83
    assert s["median_all_pair_eff"] == 0.82  # (0.81+0.83)/2 over all four
    assert s["best_pair_eff"] == 0.85


def test_summary_quiet_excludes_depressed_bandwidth_windows():
    # Same eff everywhere, but pair 1's brackets ran at 40% of the session's
    # best bandwidth: quiet=False, so it leaves the clean+quiet median.
    pairs = [
        _pair(0, 0.84, mem=1000.0),
        _pair(1, 0.50, mem=400.0),
        _pair(2, 0.82, mem=1000.0),
    ]
    s = summarize_pairs(pairs, 2.0, 192000, 8, 16)
    assert [p["quiet"] for p in pairs] == [True, False, True]
    assert s["n_clean_quiet_pairs"] == 2
    assert s["median_clean_quiet_pair_eff"] == 0.83
    # the all-pair median still sees the depressed window
    assert s["median_all_pair_eff"] == 0.82


def test_summary_no_clean_pairs_is_none_not_crash():
    pairs = [_pair(0, 0.6, ctl=0.75), _pair(1, 0.65, ctl=0.8)]
    s = summarize_pairs(pairs, 4.0, 192000, 8, 32)
    assert s["n_clean_pairs"] == 0
    assert s["median_clean_pair_eff"] is None
    # ceiling-normalized median still defined (falls back to all pairs)
    assert s["median_eff_vs_cpu_ceiling"] == round((0.6 / 0.75 + 0.65 / 0.8) / 2, 3)
