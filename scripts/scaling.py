"""Two-cluster-size scaling evidence (north rule): run the identical
extraction job on the identical input at local[8] and local[32] (fresh JVM
per run, CPU-pinned via taskset, best of REPS runs to damp co-tenant noise)
and report throughput at both plus scaling efficiency
eff = (docs/sec @ 32) / (4 x docs/sec @ 8).

Also measures a pure-CPU control (independent busy-loop processes at 8 and
32 pinned cores) so the box's own scaling ceiling is visible next to the
job's number.

Usage: python scripts/scaling.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(cores: int, n_pages: int) -> float:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), BENCH_PAGES=str(n_pages))
    # Pin to exactly `cores` CPUs: local[N] caps task slots but JVM GC /
    # shuffle threads and Python workers would otherwise use idle host cores.
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "bench.py"), "--pipeline-only"]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])["extraction"]["docs_per_sec"]


def _burn(q):
    t0 = time.monotonic()
    x = n = 0
    while time.monotonic() - t0 < 3.0:
        for i in range(10000):
            x += i * i
        n += 1
    q.put(n)


def _memburn(q):
    """Streaming read-modify-write over a 64 MB buffer (far beyond LLC):
    counts passes in a fixed window, so N processes measure aggregate
    MEMORY BANDWIDTH the way _burn measures aggregate ALU throughput."""
    import numpy as np

    a = np.zeros(8_000_000, dtype=np.float64)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 2.5:
        a += 1.0
        n += 1
    q.put(n)


def mem_control(procs: int) -> float:
    os.sched_setaffinity(0, set(range(procs)))
    try:
        q = mp.Queue()
        ps = [mp.Process(target=_memburn, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        return total
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


def cpu_control(procs: int) -> float:
    os.sched_setaffinity(0, set(range(procs)))
    try:
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        return total
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


def pairs_mode(n_pages: int, n_iters: int, lo: int, hi: int) -> None:
    """Interleaved pinned pairs with a pure-CPU control bracketing each
    pair: run control(lo)+control(hi), job(lo), job(hi), controls again.
    A pair is CLEAN when both bracket ALU-control efficiencies sit in
    [0.95, 1.05] (the box scaled compute faithfully during that window);
    MEM_STABLE when same-arm bandwidth brackets agree within 15%; QUIET
    when every bracket ran within 25% of the session's best bandwidth.
    The reported statistics are the medians over clean and clean+quiet
    pairs — best-of-runs is kept only as context. Each job() is itself
    internally best-of-2/3 (bench.py), damping within-run spikes."""
    import statistics

    sys.path.insert(0, REPO)
    from bench import corpus_path

    corpus_path(n_pages)
    # warm-up corpora (bench.py sizes them max(2000, 64*cores))
    for cores in (lo, hi):
        corpus_path(max(2000, 64 * cores))

    ratio = hi / lo
    pairs = []
    for it in range(n_iters):
        c_lo1, c_hi1 = cpu_control(lo), cpu_control(hi)
        m_lo1, m_hi1 = mem_control(lo), mem_control(hi)
        j_lo = run_job(lo, n_pages)
        j_hi = run_job(hi, n_pages)
        c_lo2, c_hi2 = cpu_control(lo), cpu_control(hi)
        m_lo2, m_hi2 = mem_control(lo), mem_control(hi)
        pairs.append(make_pair(it, ratio, j_lo, j_hi,
                               (c_lo1, c_hi1, c_lo2, c_hi2),
                               (m_lo1, m_hi1, m_lo2, m_hi2)))
        print(json.dumps(pairs[-1]), file=sys.stderr, flush=True)
    print(json.dumps(summarize_pairs(pairs, ratio, n_pages, lo, hi)))


def make_pair(it: int, ratio: float, j_lo: float, j_hi: float,
              ctl: tuple, mem: tuple) -> dict:
    """One pair record from raw job rates + bracket control rates
    (ctl/mem order: lo-before, hi-before, lo-after, hi-after)."""
    c_lo1, c_hi1, c_lo2, c_hi2 = ctl
    m_lo1, m_hi1, m_lo2, m_hi2 = mem
    ctl1 = c_hi1 / (ratio * c_lo1)
    ctl2 = c_hi2 / (ratio * c_lo2)
    # memory-bandwidth control, reported as ABSOLUTE per-arm rates too:
    # the job can be hit by co-tenant bandwidth pressure that an ALU
    # control never senses; bracket rates falling between iterations
    # flag exactly those windows.
    mem1 = m_hi1 / (ratio * m_lo1)
    mem2 = m_hi2 / (ratio * m_lo2)
    eff = j_hi / (ratio * j_lo)
    clean = all(0.95 <= c <= 1.05 for c in (ctl1, ctl2))
    # Same-arm memory-bandwidth brackets must agree (no co-tenant
    # bandwidth episode began or ended inside the pair's window).
    mem_stable = (min(m_lo1, m_lo2) / max(m_lo1, m_lo2) >= 0.85
                  and min(m_hi1, m_hi2) / max(m_hi1, m_hi2) >= 0.85)
    return {
        "iter": it, "docs_per_sec_lo": j_lo, "docs_per_sec_hi": j_hi,
        "eff": round(eff, 3), "ctl_before": round(ctl1, 3),
        "ctl_after": round(ctl2, 3),
        # eff divided by what the box itself scaled pure ALU work at in
        # the same window — separates the job's scaling from the host's
        # frequency/SMT ceiling (matters at 8->32 where all-cores-active
        # clocks lower than 8-active; a real N->4N adds NODES, keeping
        # per-core clocks).
        "eff_vs_cpu_ceiling": round(eff / ((ctl1 + ctl2) / 2), 3),
        "mem_eff_before": round(mem1, 3), "mem_eff_after": round(mem2, 3),
        "mem_abs": [m_lo1, m_hi1, m_lo2, m_hi2],
        "clean": clean, "mem_stable": mem_stable,
    }


def summarize_pairs(pairs: list, ratio: float, n_pages: int,
                    lo: int, hi: int) -> dict:
    """Headline statistics over pair records. Mutates pairs to add the
    session-relative ``quiet`` flag (every memory-bandwidth bracket within
    25% of the session's best for its arm — computable only once all pairs
    exist)."""
    import statistics

    best_mem_lo = max(max(p["mem_abs"][0], p["mem_abs"][2]) for p in pairs)
    best_mem_hi = max(max(p["mem_abs"][1], p["mem_abs"][3]) for p in pairs)
    for p in pairs:
        p["quiet"] = (min(p["mem_abs"][0], p["mem_abs"][2]) >= 0.75 * best_mem_lo
                      and min(p["mem_abs"][1], p["mem_abs"][3]) >= 0.75 * best_mem_hi)

    def med(sel):
        effs = sorted(p["eff"] for p in pairs if sel(p))
        return round(statistics.median(effs), 3) if effs else None

    all_effs = sorted(p["eff"] for p in pairs)
    best_lo = max(p["docs_per_sec_lo"] for p in pairs)
    best_hi = max(p["docs_per_sec_hi"] for p in pairs)
    return {
        "mode": "pairs", "n_pages": n_pages, "lo_cores": lo, "hi_cores": hi,
        "n_pairs": len(pairs),
        "n_clean_pairs": sum(p["clean"] for p in pairs),
        "n_clean_quiet_pairs": sum(p["clean"] and p["mem_stable"] and p["quiet"]
                                   for p in pairs),
        "median_clean_pair_eff": med(lambda p: p["clean"]),
        "median_clean_quiet_pair_eff": med(
            lambda p: p["clean"] and p["mem_stable"] and p["quiet"]),
        "median_all_pair_eff": round(statistics.median(all_effs), 3),
        "median_eff_vs_cpu_ceiling": round(statistics.median(
            sorted(p["eff_vs_cpu_ceiling"] for p in pairs
                   if p["mem_stable"] and p["quiet"])
            or [p["eff_vs_cpu_ceiling"] for p in pairs]), 3),
        "best_pair_eff": max(all_effs),
        "best_of_runs_eff": round(best_hi / (ratio * best_lo), 3),
        "docs_per_sec_best": {str(lo): best_lo, str(hi): best_hi},
        "pairs": pairs,
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "pairs":
        n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 192000
        n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 6
        lo = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        hi = int(sys.argv[5]) if len(sys.argv) > 5 else 32
        pairs_mode(n_pages, n_iters, lo, hi)
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 96000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    core_list = [int(c) for c in sys.argv[3].split(",")] if len(sys.argv) > 3 else [4, 8, 16, 32]
    sys.path.insert(0, REPO)
    from bench import corpus_path

    corpus_path(n_pages)
    corpus_path(200)  # warm-up corpus

    runs = {c: [run_job(c, n_pages) for _ in range(reps)] for c in core_list}
    best = {c: max(r) for c, r in runs.items()}
    ctl = {c: cpu_control(c) for c in core_list}
    result = {
        "n_pages": n_pages,
        "reps": reps,
        "docs_per_sec": {str(c): best[c] for c in core_list},
        "all_runs": {str(c): runs[c] for c in core_list},
        "efficiency": {},
        "cpu_control_efficiency": {},
    }
    for lo in core_list:
        for hi in core_list:
            if hi > lo:
                k = f"{lo}_to_{hi}"
                result["efficiency"][k] = round(best[hi] / (hi / lo * best[lo]), 3)
                result["cpu_control_efficiency"][k] = round(ctl[hi] / (hi / lo * ctl[lo]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
