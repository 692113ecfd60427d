"""Seeded rotation of the never-driver-sampled query majority (round-4
verdict item 5): the driver re-used the same 50-query sample in rounds 3
and 4, so most of the registry has never been driver-checked. Emulate the
rotation locally with an explicitly-recorded seed: sample N queries from
the pool that has NEVER appeared in any CORRECTNESS_r0*.json, run them
through the check_oracle harness at sf0.01, and write a receipt in the
driver's format with the seed and pool recorded under "_meta".

Usage: python scripts/rotation_sample.py [n=50] [seed=20260821]
"""

from __future__ import annotations

import glob
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260821

    sampled: set[str] = set()
    driver_files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json")))
    for p in driver_files:
        with open(p) as f:
            sampled |= set(json.load(f))

    from ocr_spark.queries import QUERIES

    pool = sorted(set(QUERIES) - sampled)
    pick = sorted(random.Random(seed).sample(pool, min(n, len(pool))))

    out = os.path.join(REPO, "CORRECTNESS_rotation_r5.json")
    env = dict(os.environ, CHECK_ORACLE_OUT=out)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"),
         "/root/testdata/sf0.01", *pick], cwd=REPO, env=env).returncode

    with open(out) as f:
        record = json.load(f)
    record["_meta"] = {
        "seed": seed,
        "n_requested": n,
        "pool": "registry minus union of driver samples "
                f"({[os.path.basename(p) for p in driver_files]})",
        "pool_size": len(pool),
        "n_driver_sampled_ever": len(sampled),
        "sf_dir": "/root/testdata/sf0.01",
        "sampled_queries": pick,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    n_pass = sum(1 for k, v in record.items()
                 if k != "_meta" and v.get("hash_match"))
    print(f"rotation receipt: {n_pass}/{len(pick)} hash-green -> {out}")
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
