"""Unit tests for round-4 batch: linear attribution and 2-D skyline."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestLinearAttribution:
    def test_credit_split_and_direct(self, spark, tmp_path):
        d = str(tmp_path)
        # conversions are event_id % 11 == 0
        rows = [
            # user 1: click, view, CONV(id 11) -> click+view get 5000
            (1, dt.datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 1), 1, "view", 1.0, "{}"),
            (11, dt.datetime(2024, 1, 1, 10, 2), 1, "buy", 1.0, "{}"),
            # then a trailing touch with no conversion after -> 0
            (3, dt.datetime(2024, 1, 1, 10, 3), 1, "click", 1.0, "{}"),
            # user 2: a direct conversion (no touches before)
            (22, dt.datetime(2024, 1, 1, 11, 0), 2, "buy", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["linear_attribution"](spark, d)
               .collect()}
        assert out["click"]["credit_bp"] == 5000
        assert out["click"]["n_credited"] == 1  # trailing click earns 0
        assert out["view"]["credit_bp"] == 5000
        # converting events only earn when direct: user 2's buy
        assert out["buy"]["credit_bp"] == 10000
        assert out["buy"]["n_credited"] == 1


class TestSkylineOrders:
    def test_pareto_frontier(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # (key, price, date): frontier is (0) cheapest-late,
            # (2) mid-price earlier, (4) expensive earliest
            (0, 1, "O", 10.0, "1996-05-01", "P", "c", 0, "x"),
            (1, 1, "O", 20.0, "1996-06-01", "P", "c", 0, "x"),  # dom by 0
            (2, 1, "O", 20.0, "1996-03-01", "P", "c", 0, "x"),
            (3, 1, "O", 30.0, "1996-04-01", "P", "c", 0, "x"),  # dom by 2
            (4, 1, "O", 30.0, "1996-01-01", "P", "c", 0, "x"),
            (5, 1, "O", 10.0, "1996-05-01", "P", "c", 0, "x"),  # dup of 0
        ]
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority",
                   "o_clerk", "o_shippriority", "o_comment"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        keys = sorted(r["o_orderkey"] for r in
                      QUERIES["skyline_orders"](spark, d).collect())
        # duplicate (5) is dominated by its identical twin (0, lower key)
        assert keys == [0, 2, 4]
