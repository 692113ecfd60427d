"""Unit tests for round-4 batch: Spearman rank correlation, Theil–Sen
robust trend, and the Hampel rolling-median despiking filter."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(os.path.join(d, "events.parquet"))


def _write_orders(spark, tmp_path, nation_of, orders):
    d = str(tmp_path)
    spark.createDataFrame(
        [(k, f"c{k}", n, 0.0, "SEG") for k, n in nation_of.items()],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).write.parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(i, ck, "O", price, dt.datetime(2024, 1, 1), "1-URGENT")
         for i, (ck, price) in enumerate(orders)],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).write.parquet(os.path.join(d, "orders.parquet"))
    return d


class TestSpearmanRank:
    def test_perfect_agreement(self, spark, tmp_path):
        # nation 0: 3 orders x 100; nation 1: 2 x 50; nation 2: 1 x 10 —
        # revenue and count rank identically
        nation_of = {10: 0, 11: 1, 12: 2}
        orders = ([(10, 100.0)] * 3 + [(11, 50.0)] * 2 + [(12, 10.0)])
        d = _write_orders(spark, tmp_path, nation_of, orders)
        out = QUERIES["spearman_rank"](spark, d).collect()[0].asDict()
        assert out["n_nations"] == 3
        assert out["sum_d2"] == 0
        assert out["spearman_bp"] == 10000

    def test_perfect_reversal(self, spark, tmp_path):
        # revenue order 0>1>2, count order 2>1>0 -> rho = -1
        nation_of = {10: 0, 11: 1, 12: 2}
        orders = ([(10, 300.0)] + [(11, 50.0)] * 2 + [(12, 10.0)] * 3)
        d = _write_orders(spark, tmp_path, nation_of, orders)
        out = QUERIES["spearman_rank"](spark, d).collect()[0].asDict()
        # d = (1-3), (2-2), (3-1) -> sum_d2 = 8; 1 - 48/24 = -1
        assert out["sum_d2"] == 8
        assert out["spearman_bp"] == -10000


class TestTheilSenTrend:
    def test_outlier_resistant_slope(self, spark, tmp_path):
        d = str(tmp_path)
        # daily counts 2,4,6,80,10: a clean +2/day trend with one spike.
        # Least squares would chase the 80; the median pairwise slope
        # stays at 2/day.
        counts = {1: 2, 2: 4, 3: 6, 4: 80, 5: 10}
        rows = []
        eid = 0
        for day, c in counts.items():
            for _ in range(c):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "a",
                             1.0, "{}"))
                eid += 1
        _write_events(spark, d, rows)
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["theil_sen_trend"](spark, d).collect()}
        assert out["a"]["n_days"] == 5
        assert out["a"]["n_pairs"] == 10
        assert out["a"]["slope_ppm_per_day"] == 2000000

    def test_negative_trend(self, spark, tmp_path):
        d = str(tmp_path)
        counts = {1: 9, 2: 6, 3: 3}
        rows = []
        eid = 0
        for day, c in counts.items():
            for _ in range(c):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "b",
                             1.0, "{}"))
                eid += 1
        _write_events(spark, d, rows)
        out = QUERIES["theil_sen_trend"](spark, d).collect()[0].asDict()
        assert out["slope_ppm_per_day"] == -3000000


class TestHampelFilter:
    def test_spike_flagged_level_shift_absorbed(self, spark, tmp_path):
        d = str(tmp_path)
        # 9 days at 10, except day 5 at 100: the spike flags, its
        # neighbors (whose windows contain the spike) do not, because
        # the rolling median ignores one outlier.
        counts = {day: (100 if day == 5 else 10) for day in range(1, 10)}
        rows = []
        eid = 0
        for day, c in counts.items():
            for _ in range(c):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "a",
                             1.0, "{}"))
                eid += 1
        _write_events(spark, d, rows)
        out = {r["day"]: r.asDict()
               for r in QUERIES["hampel_filter"](spark, d).collect()}
        assert out["2024-01-05"]["spike"] == 1
        assert out["2024-01-05"]["rolling_med"] == 10
        # constant-window convention: MAD 0 and cnt == med -> no flag
        assert out["2024-01-04"]["spike"] == 0
        assert out["2024-01-06"]["spike"] == 0
        assert sum(v["spike"] for v in out.values()) == 1

    def test_median_is_lower_median_on_even_window(self, spark, tmp_path):
        d = str(tmp_path)
        # 4 days: counts 1,2,3,4. Day 1's window is rows 1..4 (3
        # following, 0 preceding) -> sorted [1,2,3,4], lower median 2.
        rows = []
        eid = 0
        for day, c in {1: 1, 2: 2, 3: 3, 4: 4}.items():
            for _ in range(c):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "a",
                             1.0, "{}"))
                eid += 1
        _write_events(spark, d, rows)
        out = {r["day"]: r.asDict()
               for r in QUERIES["hampel_filter"](spark, d).collect()}
        assert out["2024-01-01"]["rolling_med"] == 2
