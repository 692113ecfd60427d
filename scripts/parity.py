"""Single-node parity harness: run a query's Spark implementation and its
DuckDB oracle twin on the same sf dir, both with all cores, best of N.

Usage: python scripts/parity.py [sf_dir] [query ...]   (default: the
extraction + scoring suite at /root/testdata/sf0.1)

Feeds the BENCH.md parity table. The oracle SQL is operation-identical by
construction, so this compares engine execution, not algorithm choice.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
DEFAULT_QUERIES = [
    "extract_aadhaar", "extract_pan", "extract_vehicle_rc",
    "classify_documents", "score_and_decide", "minhash_band_signatures",
    "simhash", "word_stats",
]
BEST_OF = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as E

    from ocr_spark.session import get_spark

    cores = os.cpu_count() or 8
    spark = get_spark(app_name="parity", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute(f"SET threads={cores}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    # warm-up: JVM codegen + python workers
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    print(f"{'query':32s} {'duckdb':>8s} {'spark':>8s} {'ratio':>6s}")
    for name in names:
        sql = oracles.get(name)
        dt = st = None
        if sql is not None:
            # CREATE TEMP TABLE materializes every output column (a bare
            # COUNT(*) would let the optimizer prune the expensive
            # expressions away), matching Spark's noop-write sink.
            dt = min(
                _t(lambda: con.execute(f"CREATE OR REPLACE TEMP TABLE _parity AS ({sql})"))
                for _ in range(BEST_OF)
            )
        # Same heap-state isolation bench.py uses: without a full GC between
        # queries the shared JVM carries the previous plans' garbage and a
        # query that times 2.5 s in isolation records 10+ s mid-suite
        # (measured; see BENCH.md measurement protocol).
        spark._jvm.System.gc()
        st = min(
            _t(lambda: qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save())
            for _ in range(BEST_OF)
        )
        ratio = f"{st / dt:.2f}x" if dt else "—"
        print(f"{name:32s} {dt if dt else 0:8.2f} {st:8.2f} {ratio:>6s}")
    return 0


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
