"""Per-query bench diff across rounds (round-4 verdict item 4).

Sources:
- r3: the per-query fragment recoverable from BENCH_r03.json's stdout
  tail (the one-line record that overflowed the driver's capture).
- r4: BENCH_details.json as committed at the round-4 close
  (git show <r4_rev>:BENCH_details.json).
- r5: the working-tree BENCH_details.json (the quiet-window run).

Writes BENCH_diff.json: {query: {r3, r4, r5, r5_over_r4}}, plus a
summary listing r5/r4 regressions > 1.3x on queries >= 0.2 s (below
that, job-overhead jitter dominates and a ratio is noise by
construction).

Usage: python scripts/bench_diff.py [r4_rev]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4_REV = sys.argv[1] if len(sys.argv) > 1 else "a3fcff5"


def r3_fragment() -> dict[str, float]:
    with open(os.path.join(REPO, "BENCH_r03.json")) as f:
        tail = json.load(f).get("tail", "")
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', tail)}


def main() -> None:
    r3 = r3_fragment()
    r4 = json.loads(subprocess.run(
        ["git", "show", f"{R4_REV}:BENCH_details.json"], cwd=REPO,
        capture_output=True, text=True, check=True).stdout)["queries"]
    with open(os.path.join(REPO, "BENCH_details.json")) as f:
        r5 = json.load(f)["queries"]

    diff = {}
    for name in sorted(set(r3) | set(r4) | set(r5)):
        row = {"r3": r3.get(name), "r4": r4.get(name), "r5": r5.get(name)}
        if row["r4"] and row["r5"] and row["r4"] > 0:
            row["r5_over_r4"] = round(row["r5"] / row["r4"], 2)
        diff[name] = row

    regressions = {
        n: d for n, d in diff.items()
        if d.get("r5_over_r4", 0) > 1.3 and (d["r4"] or 0) >= 0.2
    }
    out = {
        "r4_rev": R4_REV,
        "n_r3_fragment": len(r3),
        "n_common_r4_r5": sum(1 for d in diff.values() if "r5_over_r4" in d),
        "regressions_over_1p3x": {n: d["r5_over_r4"] for n, d in
                                  sorted(regressions.items(),
                                         key=lambda kv: -kv[1]["r5_over_r4"])},
        "queries": diff,
    }
    path = os.path.join(REPO, "BENCH_diff.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {out['n_common_r4_r5']} comparable queries, "
          f"{len(regressions)} regressions > 1.3x "
          f"({sorted(regressions)})")


if __name__ == "__main__":
    main()
