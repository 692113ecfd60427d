"""Two-cluster-size scaling evidence (north rule): run the identical
extraction job on the identical input at local[8] and local[32] (fresh JVM
each, via subprocess) and report throughput at both plus scaling efficiency
eff = (docs/sec @ 32) / (4 x docs/sec @ 8). Writes/updates BENCH.md.

Usage: python scripts/scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, n_pages: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), BENCH_PAGES=str(n_pages))
    # Pin the process to exactly `cores` CPUs: local[N] only caps task slots
    # while JVM GC/shuffle/Python workers would otherwise spill onto the
    # host's idle cores, flattering the small-cluster number.
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "bench.py"), "--pipeline-only"]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True, cwd=REPO)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 96000
    # build the corpus once (shared, deterministic) before either run
    sys.path.insert(0, REPO)
    from bench import corpus_path

    corpus_path(n_pages)
    corpus_path(200)  # warm-up corpus

    r8 = run(8, n_pages)
    r32 = run(32, n_pages)
    t8 = r8["extraction"]["docs_per_sec"]
    t32 = r32["extraction"]["docs_per_sec"]
    eff = t32 / (4.0 * t8)
    result = {
        "n_pages": n_pages,
        "local8_docs_per_sec": t8,
        "local8_secs": r8["extraction"]["secs"],
        "local32_docs_per_sec": t32,
        "local32_secs": r32["extraction"]["secs"],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
