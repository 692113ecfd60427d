"""Timed end-to-end comparison of the three payload-join strategies on
the bench corpus (round-3 verdict item 5: the bucketed zero-Exchange path
was plan-asserted in tests/test_payload_join.py but never TIMED).

For each strategy (broadcast / shuffle / bucketed) this runs the full
extraction pipeline at BENCH_PAGES pages, best-of-REPS, after the same
worker warm-up bench.py uses, and prints one JSON line with the walls.
For "bucketed" the bucketize step (write both sides as url-bucketed
tables) is timed SEPARATELY from the join-and-extract wall: at 100 TB the
bucketed layout is the table's standing format (paid once at ingest, like
an Iceberg bucket(N, url) partition spec), not a per-query cost — but the
one-off cost must still be visible, not hidden.

Usage: python scripts/payload_join_bench.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import _force, corpus_path
    from ocr_spark.pipeline import run_pipeline
    from ocr_spark.session import get_spark

    spark = get_spark(app_name="payload_join_bench", cores=cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    d = corpus_path(n_pages)
    pages = os.path.join(d, "pages.parquet")
    payloads = os.path.join(d, "payloads.parquet")
    size = os.path.getsize(pages)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(1 << 20, size // (cores * 2))))

    # worker warm-up (same rationale as bench.py)
    wd = corpus_path(max(2000, 64 * cores))
    _force(run_pipeline(spark, os.path.join(wd, "pages.parquet"),
                        os.path.join(wd, "payloads.parquet")))

    results: dict[str, dict] = {}
    bucket_loc = "/tmp/ocr_spark_bucketed_join_bench"

    for strategy in ("broadcast", "shuffle", "bucketed"):
        kw = {"payload_join": strategy}
        setup_secs = None
        if strategy == "bucketed":
            shutil.rmtree(bucket_loc, ignore_errors=True)
            kw["bucket_location"] = bucket_loc
            # time the one-off bucketize (first plan build triggers the
            # saveAsTable writes) apart from the steady-state join wall
            t0 = time.monotonic()
            df = run_pipeline(spark, pages, payloads, **kw)
            setup_secs = round(time.monotonic() - t0, 3)
        else:
            df = run_pipeline(spark, pages, payloads, **kw)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        runs = []
        for _ in range(max(1, reps)):
            t0 = time.monotonic()
            _force(df)
            runs.append(round(time.monotonic() - t0, 3))
        results[strategy] = {
            "secs": min(runs), "runs": runs,
            "docs_per_sec": round(n_pages / min(runs), 1),
            "n_exchanges_final_stage": n_exchanges,
            **({"bucketize_setup_secs": setup_secs} if setup_secs else {}),
        }

    print(json.dumps({
        "metric": "payload_join_strategy_walls",
        "n_pages": n_pages, "cores": cores, "reps": reps,
        "strategies": results,
    }))


if __name__ == "__main__":
    main()
