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


def main() -> None:
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
