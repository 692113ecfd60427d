"""Unit tests for round-4 batch: deferred revenue recognition."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestRevenueRecognitionSchedule:
    def test_largest_remainder_to_the_cent(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # key 7: 100.00 -> 3334 + 3333 + 3333 cents
            (7, 1, "O", 100.00, dt.datetime(2024, 1, 15), "1-URGENT"),
            # key 14: 0.02 -> 1 + 1 + 0
            (14, 1, "O", 0.02, dt.datetime(2024, 1, 15), "1-URGENT"),
            # key 3: NOT in the deferred cohort (not %7)
            (3, 1, "O", 999.00, dt.datetime(2024, 1, 15), "1-URGENT"),
        ]
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["month"]: r.asDict()
               for r in QUERIES["revenue_recognition_schedule"](
                   spark, d).collect()}
        assert set(out) == {"2024-01", "2024-02", "2024-03"}
        assert out["2024-01"]["recognized_cents"] == 3334 + 1
        assert out["2024-02"]["recognized_cents"] == 3333 + 1
        assert out["2024-03"]["recognized_cents"] == 3333 + 0
        # every contract's schedule sums to its total to the cent
        total = sum(v["recognized_cents"] for v in out.values())
        assert total == 10000 + 2
        assert out["2024-01"]["n_contracts"] == 2

    def test_month_end_clamping(self, spark, tmp_path):
        d = str(tmp_path)
        # Jan 31 + 1 month clamps to Feb 29 (2024 is a leap year) in
        # BOTH engines -> months land in 01/02/03, never skip February
        rows = [(7, 1, "O", 30.00, dt.datetime(2024, 1, 31),
                 "1-URGENT")]
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["month"] for r in
               QUERIES["revenue_recognition_schedule"](spark, d)
               .collect()}
        assert out == {"2024-01", "2024-02", "2024-03"}
