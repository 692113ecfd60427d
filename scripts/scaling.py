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
    sys.path.insert(0, REPO)
    from bench import corpus_path

    corpus_path(n_pages)
    corpus_path(200)  # warm-up corpus

    runs8 = [run_job(8, n_pages) for _ in range(reps)]
    runs32 = [run_job(32, n_pages) for _ in range(reps)]
    t8, t32 = max(runs8), max(runs32)
    ctl8, ctl32 = cpu_control(8), cpu_control(32)
    result = {
        "n_pages": n_pages,
        "reps": reps,
        "local8_docs_per_sec": t8,
        "local8_all_runs": runs8,
        "local32_docs_per_sec": t32,
        "local32_all_runs": runs32,
        "scaling_efficiency_8_to_32": round(t32 / (4.0 * t8), 3),
        "cpu_control_efficiency_8_to_32": round(ctl32 / (4.0 * ctl8), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
