"""Unit tests for round-4 batch: water-filling budget allocation, MAD
outlier screen, sweep-line concurrency profile."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestWaterfillBudget:
    def test_saturation_and_prorata(self, spark, tmp_path):
        d = str(tmp_path)
        # 3 hosts via doc_id % 17: ids 0 (x2 docs), 1 (x1), 2 (x1).
        # Use n_chars to set weights.
        rows = [
            (0, "a", "en", "s", 10),     # h0: cap 6 (2 docs), w 30
            (17, "b", "en", "s", 20),
            (1, "c", "en", "s", 1000),   # h1: cap 3, w 1000
            (2, "d", "en", "s", 500),    # h2: cap 3, w 500
        ]
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["host"]: r.asDict()
               for r in QUERIES["waterfill_budget"](spark, d).collect()}
        # budget = (6+3+3)*6//10 = 7
        # cap/w ascending: h1 (3/1000), h2 (3/500), h0 (6/30)
        # h1 saturates: 3*1530 <= 7*1000; h2 saturates: 3*530 <= 4*500
        # h0: 6*30 <= 1*30 false -> pro-rata: (7-6)*30//30 = 1
        assert out["h1"]["saturated"] == 1 and out["h1"]["alloc"] == 3
        assert out["h2"]["saturated"] == 1 and out["h2"]["alloc"] == 3
        assert out["h0"]["saturated"] == 0 and out["h0"]["alloc"] == 1
        # total allocation never exceeds the budget
        assert sum(v["alloc"] for v in out.values()) <= 7


class TestMadOutliers:
    def test_robust_median_and_gate(self, spark, tmp_path):
        d = str(tmp_path)
        # priority A: 9 orders near 100.00 plus one 100000.00 fat-finger
        rows = []
        oid = 0
        for v in [99.0, 100.0, 100.0, 100.0, 101.0, 101.0, 102.0, 98.0,
                  100.0, 100000.0]:
            rows.append((oid, 1, "O", v, "1996-01-02", "A", "c", 0, "x"))
            oid += 1
        # priority B: perfectly uniform -> MAD 0, nothing flagged by >
        for v in [50.0] * 4:
            rows.append((oid, 1, "O", v, "1996-01-02", "B", "c", 0, "x"))
            oid += 1
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority",
                   "o_clerk", "o_shippriority", "o_comment"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["priority"]: r.asDict()
               for r in QUERIES["mad_outliers"](spark, d).collect()}
        # A: sorted cents low-median (10 values, rn 5) = 10000
        assert out["A"]["median_cents"] == 10000
        # devs sorted: [0,0,0,0,100,100,100,200,200,9990000]; rn 5 -> 100
        assert out["A"]["mad_cents"] == 100
        # outliers: dev > 300 -> only the fat finger
        assert out["A"]["n_outliers"] == 1
        assert out["A"]["outlier_bp"] == 1000
        # B: MAD 0, strict > flags nothing
        assert out["B"]["mad_cents"] == 0
        assert out["B"]["n_outliers"] == 0


class TestConcurrencyProfile:
    def test_sweep_and_touching_intervals(self, spark, tmp_path):
        d = str(tmp_path)
        # durations are event_id % 7 + 1 minutes
        rows = [
            # three overlapping on Jan 1: [10:00:10, 10:01:10),
            # [10:00:30, 10:02:30), [10:01:00, 10:04:00)
            (0, dt.datetime(2024, 1, 1, 10, 0, 10), 1, "a", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 10, 0, 30), 1, "a", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 1, 0), 1, "a", 1.0, "{}"),
            # touching pair on Jan 2: [11:00, 11:01) then start at 11:01
            (7, dt.datetime(2024, 1, 2, 11, 0, 0), 1, "a", 1.0, "{}"),
            (8, dt.datetime(2024, 1, 2, 11, 1, 0), 1, "a", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {str(r["day"]): r.asDict()
               for r in QUERIES["concurrency_profile"](spark, d)
               .collect()}
        # Jan 1: all three alive at 10:01:00-10:01:10
        assert out["2024-01-01"]["max_concurrent"] == 3
        assert out["2024-01-01"]["n_starts"] == 3
        # Jan 2: end at 11:01 meets start at 11:01 -> -1 sorts first,
        # never 2 concurrent
        assert out["2024-01-02"]["max_concurrent"] == 1
        assert out["2024-01-02"]["n_starts"] == 2
