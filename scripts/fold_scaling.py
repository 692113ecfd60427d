"""Fold a pairs-mode scaling session (scaling.py stdout JSON) into
BENCH_scaling.json under runs["<lo>_to_<hi>"], recomputing the headline
as the median clean-pair efficiency of the best true-4x run available
(4->16 preferred over 8->32: same N->4N ratio, hi arm leaves half the
box for co-tenants so ALU-clean brackets are reachable).

Usage: python scripts/fold_scaling.py /tmp/scaling_4_16.json
"""

from __future__ import annotations

import json
import sys

REC = "BENCH_scaling.json"


def main() -> None:
    session = json.load(open(sys.argv[1]))
    rec = json.load(open(REC))
    key = f"{session['lo_cores']}_to_{session['hi_cores']}"
    if key in rec["runs"]:
        # merge pair lists and re-summarize via scaling.py's statistics
        sys.path.insert(0, "scripts")
        from scaling import summarize_pairs

        old_pairs = rec["runs"][key]["pairs"]
        for p in session["pairs"]:
            p["iter"] = len(old_pairs) + p["iter"]
        merged = old_pairs + session["pairs"]
        ratio = session["hi_cores"] / session["lo_cores"]
        session = summarize_pairs(
            merged, ratio, session["n_pages"],
            session["lo_cores"], session["hi_cores"])
    rec["runs"][key] = session

    if (session["lo_cores"] * 4 == session["hi_cores"]
            and session.get("median_clean_pair_eff") is not None):
        effs = sorted(p["eff"] for p in session["pairs"] if p["clean"])
        rec["headline"] = {
            "metric": (f"median clean-pair scaling efficiency "
                       f"{key.replace('_to_', '->')} cores (N->4N), "
                       f"{session['n_pages'] // 1000}k pages"),
            "value": session["median_clean_pair_eff"],
            "bar": 0.8,
            "met": session["median_clean_pair_eff"] >= 0.8,
            "clean_pair_effs": effs,
            "context_8_to_16_median": rec["runs"]
            .get("8_to_16", {}).get("median_clean_pair_eff"),
        }
    json.dump(rec, open(REC, "w"), indent=1)
    print(json.dumps({k: v for k, v in session.items() if k != "pairs"},
                     indent=1))
    print("headline:", json.dumps(rec["headline"]))


if __name__ == "__main__":
    main()
