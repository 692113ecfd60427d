"""Unit tests for round-4 batch: exact weighted median and Kadane-style
revenue run extremes."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestWeightedMedian:
    def test_weight_pulls_median(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # flag N: prices 1.00 (w=1), 2.00 (w=1), 3.00 (w=10) —
            # unweighted median 2.00, weighted median 3.00
            (1, 1, 1, 1, 1.0, 1.00, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
            (1, 2, 1, 2, 1.0, 2.00, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
            (1, 3, 1, 3, 10.0, 3.00, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
            # flag R: symmetric 2-row case crosses at the first row
            (2, 4, 1, 1, 1.0, 5.00, 0.0, 0.0, "R", "O",
             dt.datetime(2024, 1, 1)),
            (2, 5, 1, 2, 1.0, 7.00, 0.0, 0.0, "R", "O",
             dt.datetime(2024, 1, 1)),
        ]
        spark.createDataFrame(
            rows, ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                   "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                   "l_returnflag", "l_linestatus", "l_shipdate"]
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {r["l_returnflag"]: r.asDict()
               for r in QUERIES["weighted_median"](spark, d).collect()}
        assert out["N"]["total_weight"] == 12
        assert out["N"]["weighted_median_cents"] == 300
        # 2*1 >= 2 at the first row -> lower weighted median
        assert out["R"]["weighted_median_cents"] == 500


class TestRevenueRunExtremes:
    def test_planted_hot_streak(self, spark, tmp_path):
        d = str(tmp_path)
        # 6 days of revenue 10, except days 3-4 at 40 (the hot run)
        # and day 6 at 1 (the drawdown)
        per_day = {1: 10, 2: 10, 3: 40, 4: 40, 5: 10, 6: 1}
        rows = []
        okey = 0
        for day, amount in per_day.items():
            rows.append((okey, 1, "O", float(amount),
                         dt.datetime(2024, 1, day), "1-URGENT"))
            okey += 1
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = QUERIES["revenue_run_extremes"](spark, d).collect()[0]
        assert out["n_days"] == 6
        # mean-centered x_i = r_i*6 - 111_00*... : S=11100 cents, N=6;
        # days 3,4: 4000*6-11100 = +12900 each -> best 25800, end day 4
        assert out["best_run_scaled"] == 25800
        assert out["best_run_end"] == "2024-01-04"
        # worst run = day 5+6 (600*... ) day5: 1000*6-11100=-5100,
        # day6: 100*6-11100=-10500 -> -15600 ending day 6
        assert out["worst_run_scaled"] == -15600
        assert out["worst_run_end"] == "2024-01-06"
